"""Brute-force semantic checks for the round-7 lanes (q183-q192),
beyond their value-hash oracle parity: each lane's answer is recomputed
in plain Python/pandas from the sf0.001 parquet and compared, the same
strategy as test_warehouse's round-5/6 sections.
"""

from __future__ import annotations

import collections
import itertools

import pandas as pd
import pytest

from pandamapreduce_spark.plans import REGISTRY
from pandamapreduce_spark.plans.warehouse import KHOP_SUPPORT, LPA_ROUNDS, MAX_BASKET

from tests.conftest import SF_DIR


def _edges():
    """Support-filtered co-purchase edge set (the q169/q184/q187 graph),
    recomputed in pandas."""
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    items = li.drop_duplicates()
    sz = items.groupby("l_orderkey")["l_partkey"].transform("size")
    items = items[sz <= MAX_BASKET]
    pairs = collections.Counter()
    for _, grp in items.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(grp["l_partkey"]), 2):
            pairs[(a, b)] += 1
    und = {p for p, n in pairs.items() if n >= KHOP_SUPPORT}
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return und, adj


def test_lpa_communities_match_python(spark):
    und, adj = _edges()
    labels = {u: u for u in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for u in adj:
            counts = collections.Counter(labels[v] for v in adj[u])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            # mode, ties to the SMALLEST label
            top = best[1]
            new[u] = min(l for l, c in counts.items() if c == top)
        labels = new
    got = {
        r.p_partkey: r.community
        for r in REGISTRY["q184_communities"].build(spark, SF_DIR).collect()
    }
    assert got == labels


def test_link_prediction_matches_python(spark):
    und, adj = _edges()
    rows = REGISTRY["q187_link_prediction"].build(spark, SF_DIR).collect()
    assert rows, "fixture produced no distance-2 candidates"
    for r in rows:
        u, w = r.part_a, r.part_b
        assert (u, w) not in und, "recommended an existing edge"
        common = adj[u] & adj[w]
        assert len(common) == r.cn and r.cn >= 1
        assert r.deg_a == len(adj[u]) and r.deg_b == len(adj[w])
        assert r.nbr_jaccard == pytest.approx(
            len(common) / (len(adj[u]) + len(adj[w]) - len(common))
        )
        ra = sum(round(1.0 / len(adj[v]), 9) for v in common)
        assert r.resource_alloc == pytest.approx(ra, abs=1e-9)


def test_neardup_eval_truth_is_bruteforce_complete(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    grams = {}
    for r in docs.itertuples(index=False):
        toks = r.text.split()
        grams[r.doc_id] = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    n_true = 0
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = grams[a], grams[b]
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            if 2 * inter >= (len(ga) + len(gb)) - inter:  # J >= 1/2, integer form
                n_true += 1
    row = REGISTRY["q185_neardup_eval"].build(spark, SF_DIR).collect()[0]
    assert row.n_true == n_true and n_true > 0
    assert row.n_hit <= min(row.n_true, row.n_cand)
    assert 0.0 <= row.precision_at_tau <= 1.0 and 0.0 <= row.recall_at_tau <= 1.0


def test_pareto_abc_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])
    cents = (
        (li["l_extendedprice"] * 100).round().astype("int64").groupby(li["l_partkey"]).sum()
    )
    df = cents.reset_index(name="cents").sort_values(
        ["cents", "l_partkey"], ascending=[False, True]
    )
    total = int(df["cents"].sum())
    df["cum"] = df["cents"].cumsum()
    df["cls"] = [
        "A" if 100 * c <= 80 * total else ("B" if 100 * c <= 95 * total else "C")
        for c in df["cum"]
    ]
    want = df.groupby("cls")["cents"].agg(["size", "sum"])
    got = {r.abc_class: r for r in REGISTRY["q189_pareto_abc"].build(spark, SF_DIR).collect()}
    assert set(got) == set(want.index)
    for cls, row in want.iterrows():
        assert got[cls].n_parts == row["size"]
        assert got[cls].revenue == pytest.approx(row["sum"] / 100.0)


def test_cms_never_underestimates_and_width_helps(spark):
    rows = REGISTRY["q190_cms_error_profile"].build(spark, SF_DIR).collect()
    by_w = collections.defaultdict(dict)
    for r in rows:
        by_w[r.width][r.err_bucket] = r
        assert r.max_overestimate >= 0  # CMS property: never under
    exact_share = {w: d.get("a_exact").share if d.get("a_exact") else 0.0 for w, d in by_w.items()}
    widths = sorted(exact_share)  # wider sketch => never a smaller exact share
    for lo, hi in zip(widths, widths[1:]):
        assert exact_share[hi] >= exact_share[lo], (lo, hi, exact_share)
    for d in by_w.values():
        assert sum(r.share for r in d.values()) == pytest.approx(1.0)


def test_seasonal_index_matches_python(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"])
    x = (li["l_shipdate"].dt.year - 1992) * 12 + li["l_shipdate"].dt.month - 1
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    cells = cents.groupby(x).sum().to_dict()
    per_month = collections.defaultdict(list)
    for m, yc in cells.items():
        win = {d: cells.get(m + d) for d in range(-6, 7)}
        if any(v is None for v in win.values()):
            continue
        trend24 = win[-6] + win[6] + 2 * sum(win[d] for d in range(-5, 6))
        if trend24 <= 0:
            continue
        per_month[(m % 12) + 1].append(round(24 * yc / trend24, 9))
    got = {r.month: r for r in REGISTRY["q191_seasonal_index"].build(spark, SF_DIR).collect()}
    assert set(got) == set(per_month)
    for month, ratios in per_month.items():
        assert got[month].n_obs == len(ratios)
        assert got[month].seasonal_index == pytest.approx(sum(ratios) / len(ratios), abs=1e-9)


def test_recommendations_never_owned_and_scores_positive(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    owned = (
        o[o["o_custkey"] < 50]
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")
        .groupby("o_custkey")["l_partkey"]
        .apply(set)
        .to_dict()
    )
    rows = REGISTRY["q192_recommendations"].build(spark, SF_DIR).collect()
    assert rows, "fixture produced no recommendations"
    per_cust = collections.defaultdict(list)
    for r in rows:
        assert r.rec_part not in owned[r.custkey], "recommended an owned part"
        assert r.score > 0 and r.n_antecedents >= 1
        per_cust[r.custkey].append(r.score)
    for scores in per_cust.values():
        assert len(scores) <= 3
        assert scores == sorted(scores, reverse=True)


def test_semdedup_verdict_shape(spark):
    rows = REGISTRY["q183_semdedup"].build(spark, SF_DIR).collect()
    assert rows, "fixture produced no semantic clusters"
    clusters = collections.defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    for cid, members in clusters.items():
        assert len(members) >= 2, "singleton cluster emitted"
        assert cid == min(m.doc_id for m in members), "label is not the component min"
        kept = [m for m in members if m.keep]
        assert len(kept) == 1
        best = max(members, key=lambda m: (m.n_chars, -m.doc_id))
        assert kept[0].doc_id == best.doc_id


def test_phash_finds_planted_reencodes(spark):
    import hashlib

    from pandamapreduce_spark.plans.multimodal import (
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_K,
        PHASH_NOISE,
        _PHASH_BAND_W,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    planted = {}
    for r in docs.itertuples(index=False):
        seed = hashlib.md5(r.text.encode()).hexdigest()
        h = flip = 0
        for s in range(PHASH_BITS // 16):
            d = hashlib.md5(f"{seed}:ahash{s}".encode()).digest()
            n = hashlib.md5(f"{seed}:noise{s}".encode()).digest()
            for j in range(16):
                bit = 1 << (s * 16 + j)
                if d[j] >= 128:
                    h |= bit
                if n[j] < PHASH_NOISE:
                    flip |= bit
        planted[r.doc_id] = bin(flip).count("1")
    rows = REGISTRY["q193_phash_neardup"].build(spark, SF_DIR).collect()
    got = {(r.asset_a, r.asset_b): r.hamming for r in rows}
    n_recoverable = 0
    for doc_id, flips in planted.items():
        pair = (doc_id * 2, doc_id * 2 + 1)
        if flips <= PHASH_K:
            # pigeonhole: <= K flips over BANDS > K bands leaves one
            # band intact => the pair MUST be found, with hamming=flips
            n_recoverable += 1
            assert got.get(pair) == flips, (pair, flips)
        elif flips > PHASH_BANDS * _PHASH_BAND_W:  # pragma: no cover
            pass
    assert n_recoverable > 0
    # exact md5 dedup finds none of these by construction: every found
    # pair with hamming >= 1 differs at the byte level
    assert any(h >= 1 for h in got.values())


def test_winsorize_matches_numpy(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source", "n_chars"])
    rows = REGISTRY["q194_winsorize"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        vals = sorted(docs[docs["source"] == r.source]["n_chars"])
        n = len(vals)
        lo = vals[(n * 1 + 99) // 100 - 1]  # nearest-rank P1: smallest v with cum >= ceil(.01n)
        hi = vals[(n * 99 + 99) // 100 - 1]
        assert (r.lo_val, r.hi_val) == (lo, hi)
        clipped = [min(max(v, lo), hi) for v in vals]
        assert r.n_docs == n
        assert r.n_clip_low == sum(v < lo for v in vals)
        assert r.n_clip_high == sum(v > hi for v in vals)
        assert r.mean_raw == pytest.approx(sum(vals) / n)
        assert r.mean_winsorized == pytest.approx(sum(clipped) / n)
        assert min(clipped) >= lo and max(clipped) <= hi


def test_target_encoding_shrinks_toward_prior(spark):
    from pandamapreduce_spark.plans.advanced import TE_SMOOTH_M

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    per = cents.groupby(o["o_custkey"]).agg(["sum", "size"])
    big_n, total = int(per["size"].sum()), int(per["sum"].sum())
    prior = total / big_n / 100.0
    rows = REGISTRY["q195_target_encoding"].build(spark, SF_DIR).collect()
    assert len(rows) == len(per)
    for r in rows:
        s, n = int(per.loc[r.custkey, "sum"]), int(per.loc[r.custkey, "size"])
        want = (s * big_n + TE_SMOOTH_M * total) / ((n + TE_SMOOTH_M) * big_n * 100)
        assert r.n_orders == n
        assert r.encoded == pytest.approx(want, rel=1e-12)
        # shrinkage: encoded sits strictly between raw mean and prior
        lo_b, hi_b = sorted((r.mean_raw, prior))
        assert lo_b - 1e-9 <= r.encoded <= hi_b + 1e-9


def test_phrase_search_matches_python(spark):
    from pandamapreduce_spark.plans.text import PHRASE

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for r in docs.itertuples(index=False):
        toks = r.text.split()
        pos = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE[0] and toks[i + 1] == PHRASE[1]
        ]
        if pos:
            want[r.doc_id] = (len(pos), pos[0])
    rows = REGISTRY["q196_phrase_search"].build(spark, SF_DIR).collect()
    got = {r.doc_id: (r.n_occurrences, r.first_pos) for r in rows}
    assert got == want and want, "phrase must occur somewhere in the fixture"


def test_dataset_card_matches_pandas(spark):
    import hashlib

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    row = REGISTRY["q197_dataset_card"].build(spark, SF_DIR).collect()[0]
    n = len(docs)
    assert row.n_docs == n
    assert row.n_sources == docs["source"].nunique()
    assert row.n_langs == docs["lang"].nunique()
    assert row.total_tokens == sum(len(t.split()) for t in docs["text"])
    assert row.mean_chars == pytest.approx(docs["n_chars"].mean())
    vals = sorted(docs["n_chars"])
    assert row.p50_chars == vals[(n + 1) // 2 - 1]  # nearest-rank: min v with 2*cum >= n
    dups = n - len({hashlib.md5(t.encode()).hexdigest() for t in docs["text"]})
    assert row.n_exact_dups == dups
    assert row.exact_dup_rate == pytest.approx(dups / n)
    alphas = [sum(c.islower() for c in t if c.isalpha() and c.islower()) / len(t) for t in docs["text"]]
    assert row.mean_alpha == pytest.approx(sum(alphas) / n, abs=1e-5)


def test_ship_sla_percentiles_match_numpy(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    delay = (m["l_shipdate"].dt.normalize() - pd.to_datetime(m["o_orderdate"])).dt.days
    rows = REGISTRY["q198_ship_sla"].build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        vals = sorted(delay[m["o_orderpriority"] == r.priority])
        n = len(vals)
        assert r.n_lineitems == n
        for p, got in ((50, r.p50_days), (90, r.p90_days), (99, r.p99_days)):
            assert got == vals[-(-p * n // 100) - 1], (r.priority, p)  # nearest-rank
        assert r.within_7d == pytest.approx(sum(v <= 7 for v in vals) / n)


def test_abandonment_sessions_match_python(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    per_hour = {}
    for _, g in ev.groupby("user_id"):
        cur = None
        last = None
        for r in g.itertuples(index=False):
            if last is None or (r.ts - last).total_seconds() > 1800:
                if cur is not None and cur["click"]:
                    h = cur["start"].hour
                    per_hour.setdefault(h, [0, 0])
                    per_hour[h][0] += 1
                    per_hour[h][1] += 0 if cur["purchase"] else 1
                cur = {"start": r.ts, "click": False, "purchase": False}
            cur["click"] |= r.event_type == "click"
            cur["purchase"] |= r.event_type == "purchase"
            last = r.ts
        if cur is not None and cur["click"]:
            h = cur["start"].hour
            per_hour.setdefault(h, [0, 0])
            per_hour[h][0] += 1
            per_hour[h][1] += 0 if cur["purchase"] else 1
    rows = REGISTRY["q199_abandonment"].build(spark, SF_DIR).collect()
    got = {r.start_hour: (r.n_click_sessions, r.n_abandoned) for r in rows}
    assert got == {h: tuple(v) for h, v in per_hour.items()} and got


def test_retention_halflife_matches_python(spark):
    import math

    from pandamapreduce_spark.plans.advanced import HL_MIN_POINTS, LN2

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    wk = ev["ts"].dt.to_period("W-SUN").dt.start_time  # date_trunc('week') = Monday start
    firsts = wk.groupby(ev["user_id"]).min()
    active = pd.DataFrame({"u": ev["user_id"], "w": wk}).drop_duplicates()
    cohorts = {}
    for r in active.itertuples(index=False):
        cw = firsts[r.u]
        k = (r.w - cw).days // 7
        cohorts.setdefault(cw, {}).setdefault(k, 0)
        cohorts[cw][k] += 1
    rows = REGISTRY["q200_retention_halflife"].build(spark, SF_DIR).collect()
    got = {r.cohort_week: r for r in rows}
    for cw, cells in cohorts.items():
        n0 = cells.get(0)
        pts = [(k, round(math.log(n / n0), 9)) for k, n in sorted(cells.items()) if k >= 1]
        if len(pts) < HL_MIN_POINTS:
            continue
        m = len(pts)
        sk = sum(k for k, _ in pts)
        skk = sum(k * k for k, _ in pts)
        sy = sum(y for _, y in pts)
        sky = sum(k * y for k, y in pts)
        den = m * skk - sk * sk
        if den <= 0:
            continue
        slope = (m * sky - sk * sy) / den
        key = str(cw.date())
        assert key in got, key
        assert got[key].n_points == m
        assert got[key].slope == pytest.approx(slope, abs=1e-9)
        if slope < 0:
            assert got[key].half_life_weeks == pytest.approx(-LN2 / slope, rel=1e-9)


def test_changepoint_matches_python(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_shipdate", "l_extendedprice"])
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["grp"] = m["o_custkey"] % 25
    m["x"] = (m["l_shipdate"].dt.year - 1992) * 12 + m["l_shipdate"].dt.month - 1
    m["cents"] = (m["l_extendedprice"] * 100).round().astype("int64")
    rows = {r.grp: r for r in REGISTRY["q201_changepoint"].build(spark, SF_DIR).collect()}
    for grp, g in m.groupby("grp"):
        cells = g.groupby("x")["cents"].sum().sort_index()
        n, tot = len(cells), int(cells.sum())
        s = 0
        best = None
        for i, (x, yc) in enumerate(cells.items(), start=1):
            if i == n:
                break
            s += int(yc)
            d = abs(n * s - i * tot)
            if best is None or d > best[0]:
                best = (d, x)
        r = rows[grp]
        assert r.n_months == n
        assert r.change_month == best[1]
        assert r.cusum_stat == pytest.approx(best[0] / (n * tot))


def test_gini_matches_python_and_bounds(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"])
    cents = (li["l_extendedprice"] * 100).round().astype("int64").groupby(li["l_partkey"]).sum()
    df = cents.reset_index(name="c").sort_values(["c", "l_partkey"])
    n, tot = len(df), int(df["c"].sum())
    siw = sum(i * int(c) for i, c in enumerate(df["c"], start=1))
    want = (2 * siw - (n + 1) * tot) / (n * tot)
    row = REGISTRY["q202_gini"].build(spark, SF_DIR).collect()[0]
    assert row.n_parts == n
    assert row.total_revenue == pytest.approx(tot / 100.0)
    assert row.gini == pytest.approx(want, abs=1e-12)
    assert 0.0 <= row.gini < 1.0
