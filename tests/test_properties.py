"""Property-based tests (hypothesis): custom operators checked against
naive Python reference implementations on randomized inputs. Few
examples per property (Spark round-trips are slow) but each example
exercises shapes the fixture data never hits — empty groups, all-ties,
single users, adversarial gaps."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from flight_data_pipeline_spark.operators.dedup import first_per_bucket
from flight_data_pipeline_spark.operators.relational import asof_join
from flight_data_pipeline_spark.operators.temporal import sessionize

T0 = dt.datetime(2024, 1, 1)

SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(st.integers(0, 3),          # key/user
              st.integers(0, 500)),       # minutes offset
    min_size=1, max_size=25,
)


def with_ids(data):
    return [(i, k, T0 + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(data)]


@SETTINGS
@given(left=rows, right=rows)
def test_asof_join_matches_naive(spark, left, right):
    lrows = with_ids(left)
    rrows = [(i + 1000, k, ts) for (i, k, ts) in with_ids(right)]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, k long, ts timestamp")

    got = {
        r.lid: r.rid_asof
        for r in asof_join(ldf, rdf, on="ts", by="k", right_cols=["rid"]).collect()
    }

    for lid, k, lts in lrows:
        cands = [(ts, rid) for rid, rk, ts in rrows if rk == k and ts <= lts]
        want = max(cands)[1] if cands else None  # latest ts, then max rid
        assert got[lid] == want, (lid, got[lid], want)


@SETTINGS
@given(data=rows, gap=st.integers(1, 120))
def test_sessionize_matches_naive(spark, data, gap):
    rws = with_ids(data)
    df = spark.createDataFrame(rws, "id long, user long, ts timestamp")
    got = {
        r.id: r.session_id
        for r in sessionize(df, "user", "ts", gap_minutes=gap).collect()
    }

    by_user: dict[int, list] = {}
    for i, u, ts in sorted(rws, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        sess, prev = 0, None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > gap * 60:
                sess += 1
            prev = ts
            assert got[i] == sess, (i, got[i], sess)


@SETTINGS
@given(data=rows)
def test_first_per_bucket_is_min_per_key(spark, data):
    rws = with_ids(data)
    df = spark.createDataFrame(rws, "id long, k long, ts timestamp")
    kept = first_per_bucket(df, F.col("k"), ["ts", "id"]).collect()

    keys = {r.k for r in kept}
    assert keys == {k for _, k, _ in rws}          # one row per bucket
    assert len(kept) == len(keys)                  # exactly one
    for r in kept:
        want = min(((ts, i) for i, k, ts in rws if k == r.k))
        assert (r.ts, r.id) == want                # deterministic min


@SETTINGS
@given(left=rows, right=rows,
       bounds=st.tuples(st.integers(-7200, 7200), st.integers(-7200, 7200))
       .filter(lambda b: b[0] < b[1]),
       bin_sec=st.sampled_from([60, 600, 3600, 7200]))
def test_range_join_binned_matches_naive(spark, left, right, bounds, bin_sec):
    """The binned interval join must produce exactly the naive
    non-equi join's pair set for arbitrary windows and bin widths —
    bin-boundary off-by-ones are the failure mode this hunts."""
    from flight_data_pipeline_spark.operators.relational import range_join_binned

    lower, upper = bounds
    lrows = with_ids(left)
    rrows = [(i + 1000, k, ts) for (i, k, ts) in with_ids(right)]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, k long, rts timestamp")

    got = {
        (r.lid, r.rid)
        for r in range_join_binned(ldf, rdf, ["k"], "ts", "rts",
                                   lower, upper, bin_sec).collect()
    }
    want = {
        (lid, rid)
        for lid, lk, lts in lrows
        for rid, rk, rts in rrows
        if lk == rk and lower <= (rts - lts).total_seconds() < upper
    }
    assert got == want


subsec_rows = st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 7_200_000)),   # milliseconds offset
    min_size=1, max_size=25,
)


@SETTINGS
@given(left=subsec_rows, right=subsec_rows,
       bounds=st.tuples(st.integers(-3600, 3600), st.integers(-3600, 3600))
       .filter(lambda b: b[0] < b[1]),
       bin_sec=st.sampled_from([60, 600, 3600]))
def test_range_join_binned_subsecond_timestamps(spark, left, right, bounds,
                                                bin_sec):
    """Sub-second timestamps: the exact range predicate must compare
    original (µs) timestamps, with whole-second truncation confined to
    bin assignment (ADVICE r2 — a view 0.2 s before a purchase in the
    same integer second was silently dropped)."""
    from flight_data_pipeline_spark.operators.relational import range_join_binned

    lower, upper = bounds
    lrows = [(i, k, T0 + dt.timedelta(milliseconds=ms))
             for i, (k, ms) in enumerate(left)]
    rrows = [(i + 1000, k, T0 + dt.timedelta(milliseconds=ms))
             for i, (k, ms) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, k long, rts timestamp")

    got = {
        (r.lid, r.rid)
        for r in range_join_binned(ldf, rdf, ["k"], "ts", "rts",
                                   lower, upper, bin_sec).collect()
    }
    want = {
        (lid, rid)
        for lid, lk, lts in lrows
        for rid, rk, rts in rrows
        if lk == rk
        and dt.timedelta(seconds=lower) <= (rts - lts) < dt.timedelta(seconds=upper)
    }
    assert got == want


words = st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                 min_size=1, max_size=8)
corpora = st.lists(st.tuples(st.integers(0, 1), words),  # (block, tokens)
                   min_size=2, max_size=12)


@SETTINGS
@given(corpus=corpora, threshold=st.sampled_from([0.3, 0.5, 0.8]),
       cap=st.integers(1, 12))
def test_jaccard_guard_has_no_false_positives(spark, corpus, threshold, cap):
    """The hot-token guard may only LOSE pairs (those sharing solely
    hot tokens), never invent them, and every reported sim must be the
    exact full-token-set Jaccard — verification is exact by design."""
    from flight_data_pipeline_spark.operators.dedup import jaccard_pairs_blocked

    rows = [(i, blk, " ".join(toks)) for i, (blk, toks) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, blk long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in jaccard_pairs_blocked(
            df, "id", "blk", "text", threshold, max_token_df=cap).collect()
    }

    want = {}
    for i, bi, ti in rows:
        for j, bj, tj in rows:
            if i < j and bi == bj:
                sa, sb = set(ti.split(" ")), set(tj.split(" "))
                jac = round(len(sa & sb) / len(sa | sb), 4)
                if jac >= threshold:
                    want[(i, j)] = jac
    assert set(got) <= set(want)                     # no false positives
    for pair, sim in got.items():
        assert sim == want[pair]                     # sims are exact


@SETTINGS
@given(corpus=corpora, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_jaccard_pairs_blocked_matches_naive(spark, corpus, threshold):
    from flight_data_pipeline_spark.operators.dedup import jaccard_pairs_blocked

    rows = [(i, blk, " ".join(toks)) for i, (blk, toks) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, blk long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in jaccard_pairs_blocked(df, "id", "blk", "text", threshold).collect()
    }

    want = {}
    for i, bi, ti in rows:
        for j, bj, tj in rows:
            if i < j and bi == bj:
                sa, sb = set(ti.split(" ")), set(tj.split(" "))
                jac = round(len(sa & sb) / len(sa | sb), 4)
                if jac >= threshold:
                    want[(i, j)] = jac
    assert got == want


@SETTINGS
@given(corpus=corpora, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_jaccard_prefix_filter_matches_naive(spark, corpus, threshold):
    """The prefix-filtered path is EXACT (full equality, not subset):
    the rarest-first (n - ceil(t*n) + 1)-prefix must surface every
    qualifying pair — this exercises the prefix lemma AND the
    float-ceil backoff (0.8 * n overshoot would silently shorten the
    prefix and lose pairs)."""
    from flight_data_pipeline_spark.operators.dedup import jaccard_pairs_blocked

    rows = [(i, blk, " ".join(toks)) for i, (blk, toks) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, blk long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in jaccard_pairs_blocked(df, "id", "blk", "text", threshold,
                                       prefix_filter=True).collect()
    }

    want = {}
    for i, bi, ti in rows:
        for j, bj, tj in rows:
            if i < j and bi == bj:
                sa, sb = set(ti.split(" ")), set(tj.split(" "))
                jac = round(len(sa & sb) / len(sa | sb), 4)
                if jac >= threshold:
                    want[(i, j)] = jac
    assert got == want


@SETTINGS
@given(corpus=corpora)
def test_bitset_masks_encode_exact_set_algebra(spark, corpus):
    """Dictionary bitset masks (the bounded-vocabulary exact-similarity
    fast path): popcounts of mask AND/OR must equal true set
    intersection/union sizes for every within-block pair, and identical
    token sets must collapse to identical masks."""
    import itertools

    from flight_data_pipeline_spark.operators.dedup import dictionary_bitset_masks

    rows = [(i, blk, " ".join(toks)) for i, (blk, toks) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, blk long, text string")
    got = {r.id: (r.mask, r.n_tokens)
           for r in dictionary_bitset_masks(df, "id", "blk", "text").collect()}

    sets = {i: (blk, set(toks)) for i, (blk, toks) in enumerate(corpus)}
    for i, (blk, s) in sets.items():
        assert got[i][1] == len(s)
    for (i, (bi, si)), (j, (bj, sj)) in itertools.combinations(sets.items(), 2):
        if bi != bj:
            continue
        mi, mj = got[i][0], got[j][0]
        assert (mi == mj) == (si == sj)
        assert bin(mi & mj).count("1") == len(si & sj)
        assert bin(mi | mj).count("1") == len(si | sj)


@SETTINGS
@given(data=rows, n_states=st.integers(1, 3))
def test_scd2_history_matches_naive(spark, data, n_states):
    from flight_data_pipeline_spark.operators.temporal import scd2_history

    evs = [(i, k, T0 + dt.timedelta(minutes=m), f"s{(i * 7 + k) % n_states}")
           for i, (k, m) in enumerate(data)]
    df = spark.createDataFrame(evs, "id long, k long, ts timestamp, st string")
    got = sorted(
        ((r.k, r.state, r.valid_from, r.valid_to, r.n_events)
         for r in scd2_history(df, "k", "ts", "st", "id").collect()),
        key=lambda t: (t[0], t[2]))

    # naive reference: sort per key by (ts, id), collapse runs
    want = []
    for k in sorted({k for _, k, _, _ in evs}):
        seq = sorted([(ts, i, s) for i, kk, ts, s in evs if kk == k])
        runs = []
        for ts, i, s in seq:
            if runs and runs[-1][0] == s:
                runs[-1][2] += 1
            else:
                runs.append([s, ts, 1])
        for j, (s, vf, n) in enumerate(runs):
            vt = runs[j + 1][1] if j + 1 < len(runs) else None
            want.append((k, s, vf, vt, n))
    assert got == sorted(want, key=lambda t: (t[0], t[2]))
    # intervals per key tile the timeline: n_events sums to input size
    assert sum(t[4] for t in got) == len(evs)


@SETTINGS
@given(base=rows, upd=rows)
def test_merge_upsert_matches_naive(spark, base, upd):
    from flight_data_pipeline_spark.operators.relational import merge_upsert

    # build keyed rows; duplicate keys collapse to the last value so
    # both the frame and the dict reference agree
    bmap = {k: m for k, m in base}
    umap = {k: m + 1000 for k, m in upd}
    bdf = spark.createDataFrame(list(bmap.items()), "k long, v long")
    udf = spark.createDataFrame(list(umap.items()), "k long, v long")

    out = {r.k: (r.v, r.action)
           for r in merge_upsert(bdf, udf, ["k"], action_col="action")
           .collect()}
    assert set(out) == set(bmap) | set(umap)
    for k in out:
        if k in umap and k in bmap:
            assert out[k] == (umap[k], "update")
        elif k in umap:
            assert out[k] == (umap[k], "insert")
        else:
            assert out[k] == (bmap[k], "carry")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


names_strategy = st.lists(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        min_size=1, max_size=3,
    ).map(" ".join),
    min_size=1, max_size=10,
)


@SETTINGS
@given(names=names_strategy, d=st.integers(1, 2))
def test_fuzzy_blocked_sound_and_complete(spark, names, d):
    """Soundness: every reported pair is a true ≤d pair with the right
    distance and multiplicities. Completeness: EVERY true ≤d pair is
    reported — the r5 blocking (Ed-Join gram prefixes + symmetric-
    delete neighborhoods for short strings) is provably complete at
    any d, with no shared-token escape hatch."""
    from collections import Counter

    from flight_data_pipeline_spark.operators.fuzzy import (
        fuzzy_string_pairs_blocked,
    )

    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r.name_a, r.name_b): (r.edit_distance, r.n_a, r.n_b)
        for r in fuzzy_string_pairs_blocked(df, "name", d).collect()
    }

    counts = Counter(names)
    uniq = sorted(counts)
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            dist = _lev(a, b)
            if dist <= d:
                assert got.get((a, b)) == (dist, counts[a], counts[b]), (
                    a, b, dist)
            else:
                assert (a, b) not in got, (a, b, dist)


# --- LTZ/NTZ + sub-second edge properties (VERDICT r4 item 7) -----------------
#
# The round-3 NTZ fixture drift showed timestamp dtype is the riskiest
# surface. These strategies generate microsecond-adversarial data (0,
# 1, 500000, 999999 µs — values that straddle whole-second truncation)
# at exact gap/bin boundaries, and run each operator under BOTH
# timestamp dtypes plus a mixed-side combination.

TS_DTYPES = ("timestamp", "timestamp_ntz")

us_rows = st.lists(
    st.tuples(st.integers(0, 2),                       # key/user
              st.integers(0, 7200),                    # seconds offset
              st.sampled_from([0, 1, 500000, 999999])),  # microseconds
    min_size=1, max_size=20,
)


def _with_ids_us(data, base=0):
    return [(i + base, k, T0 + dt.timedelta(seconds=s, microseconds=us))
            for i, (k, s, us) in enumerate(data)]


def _floor_sec(ts):
    # exact whole-second truncation of the offset from the epoch-
    # aligned T0 — mirrors to_epoch_seconds (cast to long truncates)
    return (ts - T0) // dt.timedelta(seconds=1)


@SETTINGS
@given(data=us_rows, gap=st.sampled_from([1, 2]),
       dtype=st.sampled_from(TS_DTYPES))
def test_sessionize_subsecond_both_dtypes(spark, data, gap, dtype):
    """Sessionize under LTZ and NTZ with sub-second timestamps: the
    gap compares WHOLE-SECOND epochs (to_epoch_seconds truncates), and
    a gap of exactly gap*60 s continues the session (strict >). The
    oracle mirrors that contract exactly."""
    rws = _with_ids_us(data)
    df = spark.createDataFrame(rws, f"id long, user long, ts {dtype}")
    got = {
        r.id: r.session_id
        for r in sessionize(df, "user", "ts", gap_minutes=gap).collect()
    }

    by_user: dict[int, list] = {}
    for i, u, ts in sorted(rws, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        sess, prev = 0, None
        for ts, i in evs:
            if prev is None or _floor_sec(ts) - _floor_sec(prev) > gap * 60:
                sess += 1
            prev = ts
            assert got[i] == sess, (dtype, i, got[i], sess)


@SETTINGS
@given(left=us_rows, right=us_rows,
       ldtype=st.sampled_from(TS_DTYPES), rdtype=st.sampled_from(TS_DTYPES))
def test_asof_join_subsecond_mixed_dtypes(spark, left, right,
                                          ldtype, rdtype):
    """As-of join with µs-precision timestamps under every LTZ/NTZ
    side combination (the pinned-UTC session makes NTZ a value-
    preserving reinterpretation): the match is the latest right row
    with rts ≤ lts at FULL precision — sub-second truncation must not
    leak into the comparison."""
    lrows = _with_ids_us(left)
    rrows = [(i, k, ts) for i, k, ts in _with_ids_us(right, base=1000)]
    ldf = spark.createDataFrame(lrows, f"lid long, k long, ts {ldtype}")
    rdf = spark.createDataFrame(rrows, f"rid long, k long, ts {rdtype}")

    got = {
        r.lid: r.rid_asof
        for r in asof_join(ldf, rdf, on="ts", by="k",
                           right_cols=["rid"]).collect()
    }
    for lid, k, lts in lrows:
        cands = [(ts, rid) for rid, rk, ts in rrows if rk == k and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (ldtype, rdtype, lid, got[lid], want)


@SETTINGS
@given(left=us_rows, right=us_rows,
       bounds=st.tuples(st.integers(-120, 120), st.integers(-120, 120))
       .filter(lambda b: b[0] < b[1]),
       bin_sec=st.sampled_from([1, 60, 3600]),
       ldtype=st.sampled_from(TS_DTYPES), rdtype=st.sampled_from(TS_DTYPES))
def test_range_join_binned_subsecond_mixed_dtypes(spark, left, right,
                                                  bounds, bin_sec,
                                                  ldtype, rdtype):
    """Binned range join with µs timestamps under every dtype
    combination: bins only ASSIGN (whole-second truncation there is
    coverage-safe by the widened upper bin); the kept pair set is the
    µs-exact half-open window — fractional right rows at the upper
    boundary are the regression this hunts (ADVICE r2 class)."""
    from flight_data_pipeline_spark.operators.relational import (
        range_join_binned,
    )

    lower, upper = bounds
    lrows = _with_ids_us(left)
    rrows = [(i, k, ts) for i, k, ts in _with_ids_us(right, base=1000)]
    ldf = spark.createDataFrame(lrows, f"lid long, k long, ts {ldtype}")
    rdf = spark.createDataFrame(rrows, f"rid long, k long, rts {rdtype}")

    got = {
        (r.lid, r.rid)
        for r in range_join_binned(ldf, rdf, ["k"], "ts", "rts",
                                   lower, upper, bin_sec).collect()
    }
    us = dt.timedelta(microseconds=1)
    want = {
        (lid, rid)
        for lid, lk, lts in lrows
        for rid, rk, rts in rrows
        if lk == rk
        and dt.timedelta(seconds=lower) // us
        <= (rts - lts) // us
        < dt.timedelta(seconds=upper) // us
    }
    assert got == want, (ldtype, rdtype, lower, upper, bin_sec)


# --- connected components vs union-find (random graphs) -----------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=40,
)


@SETTINGS
@given(edges=edges_strategy)
def test_connected_components_matches_union_find(spark, edges):
    """CC labels on random graphs must equal a union-find oracle's:
    every node labeled with its component's minimum id. Random shapes
    hit what the fixed chain/triangle tests can't — multi-hub merges,
    self-merging forests, duplicate/reversed edges — and a converged
    result must also be a fixed point (stable under one more round)."""
    from flight_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.label
           for r in connected_components(df, max_iter=10).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list] = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    want = {v: min(members) for members in comp.values() for v in members}

    assert got == want


# --- distributed BPE vs the serial algorithm ----------------------------------

bpe_corpora = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    min_size=1, max_size=15,
)


def _serial_bpe(word_list, num_merges, min_count=2):
    """Sennrich et al.'s algorithm, verbatim: count adjacent pairs
    over word frequencies, merge the most frequent (count desc, pair
    lexicographic tie-break) greedily left-to-right, stop when no
    pair reaches min_count."""
    from collections import Counter

    freq = Counter(word_list)
    state = {w: tuple(list(w) + ["</w>"]) for w in freq}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        eligible = {p: c for p, c in counts.items() if c >= min_count}
        if not eligible:
            break
        best = min(eligible, key=lambda p: (-eligible[p], p[0], p[1]))
        merges.append((rank, best[0], best[1],
                       best[0] + best[1], eligible[best]))
        for w, syms in state.items():
            out: list = []
            for x in syms:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            state[w] = tuple(out)
    return merges


@SETTINGS
@given(words=bpe_corpora)
def test_bpe_learn_matches_serial(spark, words):
    """The distributed learner must reproduce the serial algorithm's
    exact merge sequence — same pairs, same order, same counts — on
    randomized corpora (repeated words, nested merges, exhaustion)."""
    from flight_data_pipeline_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [(r.rank, r.left, r.right, r.merged, r.pair_count)
           for r in bpe_learn(df, "text", num_merges=8)
           .orderBy("rank").collect()]
    want = _serial_bpe(words, num_merges=8)
    assert got == want


# --- SCD2 history vs a run-length oracle --------------------------------------

scd2_rows = st.lists(
    st.tuples(st.integers(0, 2),                    # key
              st.integers(0, 100),                  # minutes offset
              st.sampled_from(["a", "b", None])),   # state (incl. NULL)
    min_size=1, max_size=20,
)


@SETTINGS
@given(data=scd2_rows)
def test_scd2_history_matches_run_length_oracle(spark, data):
    """SCD2 intervals on random event sequences (duplicate
    timestamps, NULL states, single-event keys) must equal a plain
    run-length encoding under the same (ts, id) order: one interval
    per maximal run of null-safe-equal states, valid_to = next run's
    start (NULL on the open run), n_events = run length."""
    from flight_data_pipeline_spark.operators.temporal import scd2_history

    rws = [(i, k, T0 + dt.timedelta(minutes=m), s)
           for i, (k, m, s) in enumerate(data)]
    df = spark.createDataFrame(
        rws, "id long, k long, ts timestamp, state string")
    from collections import Counter

    got = Counter(
        (r.k, r.state, r.valid_from, r.valid_to, r.n_events)
        for r in scd2_history(df, "k", "ts", "state", "id").collect()
    )

    want = []
    by_key: dict[int, list] = {}
    for i, k, ts, s in sorted(rws, key=lambda r: (r[1], r[2], r[0])):
        by_key.setdefault(k, []).append((ts, s))
    for k, evs in by_key.items():
        runs: list[list] = []
        for ts, s in evs:
            if runs and runs[-1][0] == s:
                runs[-1][2] += 1
            else:
                runs.append([s, ts, 1])
        for idx, (s, start, n) in enumerate(runs):
            nxt = runs[idx + 1][1] if idx + 1 < len(runs) else None
            want.append((k, s, start, nxt, n))
    assert got == Counter(want)


# --- duplicated-span removal vs a position-set oracle -------------------------

span_corpora = st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=9),
    min_size=2, max_size=8,
)


@SETTINGS
@given(corpus=span_corpora, n=st.sampled_from([2, 3]))
def test_remove_duplicate_spans_matches_oracle(spark, corpus, n):
    """Span removal on random corpora must equal the definition
    directly: a token is removed iff some n-gram occurrence covering
    it appears in >= 2 distinct documents (short docs are one
    whole-document gram). Random corpora hit overlapping spans,
    self-repeats, and whole-doc wipes the fixture can't."""
    from flight_data_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rws = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rws, "id long, text string")
    got = {r.id: (r.n_tokens, r.removed_tokens, r.cleaned_text)
           for r in remove_duplicate_spans(df, "id", "text", n=n).collect()}

    def grams(toks):
        if len(toks) < n:
            return [(0, tuple(toks))]
        return [(p, tuple(toks[p:p + n])) for p in range(len(toks) - n + 1)]

    gram_docs: dict[tuple, set] = {}
    for i, toks in enumerate(corpus):
        for _, g in grams(toks):
            gram_docs.setdefault(g, set()).add(i)
    for i, toks in enumerate(corpus):
        covered = set()
        for p, g in grams(toks):
            if len(gram_docs[g]) >= 2:
                covered.update(range(p, min(p + n, len(toks))))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        assert got[i] == (len(toks), len(covered), " ".join(kept)), (
            i, toks, got[i])


# --- MERGE/upsert vs a dict-merge oracle --------------------------------------

kv_frame = st.dictionaries(
    st.integers(0, 9),                               # key
    st.one_of(st.none(), st.integers(-5, 5)),        # nullable value
    min_size=0, max_size=8,
)


@SETTINGS
@given(base=kv_frame, updates=kv_frame)
def test_merge_upsert_matches_dict_merge(spark, base, updates):
    """MERGE semantics on random key/value frames must equal a plain
    dict merge: update rows win on matched keys EVEN WHEN the update
    value is NULL (presence-flag selection, not coalesce — the
    nulled-field case is exactly what a coalesce would corrupt);
    unmatched updates insert, untouched base rows carry, and the
    action audit labels each row correctly."""
    from flight_data_pipeline_spark.operators.relational import merge_upsert

    schema = "k long, v long"
    bdf = spark.createDataFrame(list(base.items()) or [], schema)
    udf = spark.createDataFrame(list(updates.items()) or [], schema)
    got = {
        r.k: (r.v, r.action)
        for r in merge_upsert(bdf, udf, ["k"], action_col="action").collect()
    }

    want = {}
    for k, v in base.items():
        want[k] = (v, "carry")
    for k, v in updates.items():
        want[k] = (v, "update" if k in base else "insert")
    assert got == want


# --- incremental view maintenance vs recompute ---------------------------------

events_kv = st.lists(
    st.tuples(st.integers(0, 4),            # key
              st.integers(-10, 10)),        # value
    min_size=0, max_size=20,
)


@SETTINGS
@given(base_rows=events_kv, delta_rows=events_kv)
def test_combine_partial_aggs_equals_recompute(spark, base_rows, delta_rows):
    """Incremental maintenance must equal recomputing the aggregate
    over base ∪ delta on random inputs — new keys, vanished keys,
    negative values (count+sum partials are additive regardless of
    sign). The identity is THE correctness contract of a maintained
    materialized view."""
    from collections import defaultdict

    from flight_data_pipeline_spark.operators.relational import (
        combine_partial_aggs,
    )

    schema = "k long, v long"

    def agg(df):
        return df.groupBy("k").agg(
            F.count("*").alias("cnt"), F.sum("v").alias("total"))

    bdf = spark.createDataFrame(base_rows or [], schema)
    ddf = spark.createDataFrame(delta_rows or [], schema)
    maintained = {
        r.k: (r.cnt, r.total)
        for r in combine_partial_aggs(
            agg(bdf), agg(ddf), ["k"], ["cnt", "total"]).collect()
    }

    want: dict = defaultdict(lambda: [0, 0])
    for k, v in base_rows + delta_rows:
        want[k][0] += 1
        want[k][1] += v
    assert maintained == {k: tuple(v) for k, v in want.items()}


@SETTINGS
@given(n=st.integers(0, 400), parts=st.integers(1, 12))
def test_assign_contiguous_ids_bijective_at_any_partitioning(
        spark, n, parts):
    """Contiguous-id assignment must produce exactly {0..n-1} — no
    gaps, no dups — for any row count and partition count, including
    empty partitions (parts > n) and empty input, and must keep every
    payload row exactly once."""
    from flight_data_pipeline_spark.operators.relational import (
        assign_contiguous_ids,
    )

    df = spark.range(0, n).repartition(parts).select(
        (F.col("id") * 7).alias("payload"))
    rows = assign_contiguous_ids(df, id_col="rid").collect()
    assert sorted(r.rid for r in rows) == list(range(n))
    assert sorted(r.payload for r in rows) == [i * 7 for i in range(n)]


@SETTINGS
@given(left=rows, right=rows,
       bounds=st.tuples(st.integers(-3600, 3600), st.integers(-3600, 3600))
       .filter(lambda b: b[0] < b[1]),
       bin_sec=st.sampled_from([60, 3600]))
def test_range_join_binned_left_keeps_unmatched(spark, left, right, bounds,
                                                bin_sec):
    """how='left': every left row appears — matched rows once per
    match with the right id, unmatched rows exactly once with NULL —
    so count(right_id) aggregates to an honest zero (the
    views_before_purchase_1h contract)."""
    from collections import Counter

    from flight_data_pipeline_spark.operators.relational import (
        range_join_binned,
    )

    lower, upper = bounds
    lrows = with_ids(left)
    rrows = [(i + 1000, k, ts) for (i, k, ts) in with_ids(right)]
    ldf = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, k long, rts timestamp")

    got = Counter(
        (r.lid, r.rid)
        for r in range_join_binned(ldf, rdf, ["k"], "ts", "rts",
                                   lower, upper, bin_sec,
                                   how="left").collect()
    )
    want = Counter()
    for lid, lk, lts in lrows:
        matches = [rid for rid, rk, rts in rrows
                   if rk == lk
                   and lower <= (rts - lts).total_seconds() < upper]
        if matches:
            for rid in matches:
                want[(lid, rid)] += 1
        else:
            want[(lid, None)] += 1
    assert got == want


def _serial_bpe_encode(word_list, num_merges, min_count=2):
    """Serial learn + apply: the final per-word segmentation after
    replaying _serial_bpe's merges — the oracle for bpe_encode."""
    from collections import Counter

    freq = Counter(word_list)
    state = {w: list(w) + ["</w>"] for w in freq}
    for _, a, b, _m, _c in _serial_bpe(word_list, num_merges, min_count):
        for w, syms in state.items():
            out: list = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            state[w] = out
    return {w: (freq[w], tuple(syms)) for w, syms in state.items()}


@SETTINGS
@given(words=bpe_corpora)
def test_bpe_encode_matches_serial(spark, words):
    """Distributed encode (nested merge fold over the broadcast merge
    list) must reproduce the serial training-time segmentation for
    every word — same tokens, same order, same multiplicities."""
    from flight_data_pipeline_spark.operators.bpe import bpe_encode, bpe_learn

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    merges = bpe_learn(df, "text", num_merges=8)
    got = {r.word: (r.n, tuple(r.tokens))
           for r in bpe_encode(df, "text", merges).collect()}
    want = _serial_bpe_encode(words, num_merges=8)
    assert got == want


# --- frequent-items sketch vs exact / bound oracles ---------------------------

sketch_streams = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
    min_size=1, max_size=120,
)


@SETTINGS
@given(items=sketch_streams)
def test_frequent_items_exact_regime_matches_counter(spark, items):
    """With counters >= vocabulary the sketch must equal the exact
    Counter on any stream, at any partitioning, err identically 0."""
    from collections import Counter

    from flight_data_pipeline_spark.operators.sketches import frequent_items

    df = spark.createDataFrame([(i,) for i in items],
                               "item string").repartition(3)
    got = {r.item: (r.cnt, r.err)
           for r in frequent_items(df, "item", k_counters=16,
                                   top=20).collect()}
    assert got == {i: (n, 0) for i, n in Counter(items).items()}


@SETTINGS
@given(batches=st.lists(sketch_streams, min_size=1, max_size=4))
def test_mg_merge_chained_bounds_hold(spark, batches):
    """Chained Misra-Gries folds over arbitrary batch splits keep the
    composed bound: cnt <= true and true - cnt <= N/(k+1), with at
    most k survivors."""
    from collections import Counter

    from flight_data_pipeline_spark.operators.sketches import mg_merge

    k = 3
    summary = spark.createDataFrame([], "item string, cnt bigint")
    for b in batches:
        delta = spark.createDataFrame(
            list(Counter(b).items()), "item string, cnt bigint")
        summary = mg_merge(summary, delta, k_counters=k)
    out = {r.item: r.cnt for r in summary.collect()}
    true = Counter(i for b in batches for i in b)
    n_total = sum(true.values())
    assert len(out) <= k
    for item, cnt in out.items():
        assert 0 < cnt <= true[item]
    for item, t in true.items():
        assert t - out.get(item, 0) <= n_total / (k + 1)


# --- skew-split join vs the plain join ---------------------------------------

skew_rows = st.lists(
    st.tuples(st.sampled_from(["hot", "a", "b", "c", "d"]),
              st.integers(min_value=0, max_value=99)),
    min_size=0, max_size=40,
)


@SETTINGS
@given(left_rows=skew_rows, right_rows=skew_rows,
       threshold=st.integers(min_value=0, max_value=10),
       how=st.sampled_from(["inner", "left"]))
def test_skew_split_join_equals_plain_join(spark, left_rows, right_rows,
                                           threshold, how):
    """For ANY frames, threshold, and supported join type, the
    two-path split must produce exactly the plain join's bag of rows
    — including empty paths, all-hot, all-cold, and unmatched keys."""
    from flight_data_pipeline_spark.operators.relational import (
        skew_split_join,
    )

    left = spark.createDataFrame(left_rows or [("__none__", -1)],
                                 "k string, lv int")
    right = spark.createDataFrame(
        [(k, f"r{v}") for k, v in right_rows] or [("__none__", "r")],
        "k string, rv string")
    got = sorted((r.k, r.lv, r.rv) for r in
                 skew_split_join(left, right, "k", threshold, how).collect())
    want = sorted((r.k, r.lv, r.rv) for r in
                  left.join(right, "k", how).collect())
    assert got == want


class TestExactArithmetic:
    """The r6 money/ratio discipline, property-pinned against Python
    Decimal ground truth: to_units must hit the exact fixed-point
    integer for any on-grid value, and the integer half-up div
    formula must equal ROUND_HALF_UP for any ratio — these two
    identities are what every converted oracle leans on."""

    @given(st.integers(min_value=0, max_value=10**9),
           st.integers(min_value=0, max_value=6))
    @settings(max_examples=200, deadline=None)
    def test_to_units_is_exact_on_grid(self, units, decimals):
        from decimal import Decimal
        from math import floor

        value = float(Decimal(units) / (10 ** decimals))
        # the Python mirror of scalars.to_units' floor(v*10^d + 0.5)
        assert floor(value * 10 ** decimals + 0.5) == units

    @given(st.integers(min_value=0, max_value=10**12),
           st.integers(min_value=1, max_value=10**12),
           st.integers(min_value=0, max_value=6))
    @settings(max_examples=200, deadline=None)
    def test_half_up_div_matches_decimal(self, num, den, d):
        from decimal import ROUND_HALF_UP, Decimal

        scale = 10 ** d
        got = (2 * num * scale + den) // (2 * den)
        want = int((Decimal(num) * scale / Decimal(den)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
        # the formula rounds half UP (toward +inf) like SQL ROUND on
        # positives; Decimal HALF_UP agrees on the non-negative domain
        assert got == want

    @given(st.integers(min_value=0, max_value=(1 << 24) - 1))
    @settings(max_examples=300, deadline=None)
    def test_hll_rho_string_arithmetic_matches_bits(self, suffix24):
        """The hex-string leading-zero computation used by
        sketches._hll_bucket_rho must equal the bit-level definition
        rho = (leading zero bits of the 24-bit suffix) + 1, clamped
        at 25 for zero."""
        hex6 = f"{suffix24:06x}"
        lz_hex = len(hex6) - len(hex6.lstrip("0"))
        if lz_hex == 6:
            got = 25
        else:
            digit = int(hex6[lz_hex], 16)
            bitlen = 4 if digit >= 8 else 3 if digit >= 4 else \
                2 if digit >= 2 else 1
            got = 4 * lz_hex + (4 - bitlen) + 1
        want = 25 if suffix24 == 0 else (24 - suffix24.bit_length()) + 1
        assert got == want


@SETTINGS
@given(
    values=st.lists(st.integers(0, 9_999), min_size=1, max_size=60),
    bin_width=st.sampled_from([100, 500, 1000]),
    p=st.sampled_from([250, 500, 900, 990]),
)
def test_histogram_quantile_within_one_bin_of_truth(spark, values,
                                                    bin_width, p):
    """quantiles_from_histogram's estimate must land within one bin
    width of the TRUE rank statistic of the underlying values (the
    estimator's advertised error bound), and its reported n_values
    must be exact — checked against a naive Python rank computation
    on randomized integer unit values, including all-ties and
    single-value shapes the fixture never produces."""
    from flight_data_pipeline_spark.operators.sketches import (
        quantiles_from_histogram,
    )

    df = spark.createDataFrame([(v,) for v in values], "u long")
    hist = (df.withColumn("g", F.lit("g"))
            .groupBy("g", F.expr(f"u div {bin_width}").alias("bin"))
            .agg(F.count("*").alias("n")))
    row = quantiles_from_histogram(
        hist, ["g"], bin_width, [p]).collect()
    assert len(row) == 1 and row[0].n_values == len(values)
    rank = -(-p * len(values) // 1000)  # ceil, matching the operator
    truth = sorted(values)[max(rank - 1, 0)]
    assert abs(row[0].est_units - truth) <= bin_width, (
        row[0].est_units, truth, values, bin_width, p)


# --- largest-remainder proration vs serial Hamilton oracle --------------------

proration_groups = st.lists(
    st.tuples(st.integers(0, 3),          # group key
              st.integers(1, 10_000)),    # row weight (positive)
    min_size=1, max_size=20,
)


@SETTINGS
@given(data=proration_groups, totals=st.tuples(
    st.integers(0, 10**9), st.integers(0, 10**9),
    st.integers(0, 10**9), st.integers(0, 10**9)))
def test_proration_matches_serial_hamilton(spark, data, totals):
    """prorate_largest_remainder must equal the serial Hamilton
    algorithm EXACTLY on random groups: identical per-row
    allocations (not just conserved sums), remainder units going to
    the largest-remainder rows with the declared tie-break. Random
    shapes hit single-row groups, all-equal weights (pure tie-break),
    and totals far larger/smaller than the weight mass."""
    from flight_data_pipeline_spark.operators.relational import (
        prorate_largest_remainder,
    )

    rows_in = [(i, k, w, totals[k]) for i, (k, w) in enumerate(data)]
    df = spark.createDataFrame(
        rows_in, "rid long, k long, w long, total long")
    got = {r.rid: (r.alloc_c, r.bumped)
           for r in prorate_largest_remainder(
               df, key="k", total_col="total", weight_col="w",
               tiebreak_col="rid").collect()}

    want = {}
    for k in {k for _, k, _, _ in rows_in}:
        grp = [(rid, w) for rid, kk, w, _ in rows_in if kk == k]
        total = totals[k]
        sum_w = sum(w for _, w in grp)
        floors = {rid: (total * w) // sum_w for rid, w in grp}
        rems = sorted(grp, key=lambda rw: (-((total * rw[1]) % sum_w),
                                           rw[0]))
        residual = total - sum(floors.values())
        bumped = {rid for rid, _ in rems[:residual]}
        for rid, _ in grp:
            want[rid] = (floors[rid] + (1 if rid in bumped else 0),
                         1 if rid in bumped else 0)
    assert got == want
