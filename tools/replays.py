"""Third-implementation replays: expected outputs re-derived from
FIRST PRINCIPLES in pandas/numpy, independent of both engines.

Why this exists (VERDICT.md round 10): for algorithmic queries the
DuckDB oracle replays the builder's own algorithm, so a bug in a
SHARED expression passes the hash gate — exactly how the
Hodges-Lehmann lower-median bug survived until round 9. The hash gate
proves Spark == DuckDB; these replays prove Spark == the algorithm's
published definition, computed a third way (numpy vectorization /
plain Python loops, never SQL, never Spark expressions).

Ground rules:
* No imports from sandbox_data_pipeline_spark — the replay must not
  share code with the implementation under test.
* Inputs come straight from the parquet via pandas.read_parquet.
* Each replay returns a pandas DataFrame with the SAME column names
  as the registry query; tools/replay_check.py canonicalizes both
  sides and compares (exact for ints/strings/bools, tolerant for
  floats — the engines' stabilization rounds doubles to 7 significant
  digits / 4 decimals, so a replay computed in a different association
  order may differ by one final-digit step; an algorithmic bug moves
  values by far more).
* Constants (K, caps, percentages) are REDECLARED literally here with
  a comment naming the production constant; tools/replay_check.py
  asserts they still match the production values, so a drifting
  constant fails loudly instead of silently diverging.
"""

from __future__ import annotations

import math
import os
from typing import Callable

import numpy as np
import pandas as pd

REPLAYS: dict[str, Callable[["Tables"], pd.DataFrame]] = {}


def replay(name: str):
    def deco(fn):
        REPLAYS[name] = fn
        return fn

    return deco


class Tables:
    """Lazy parquet loader: t.documents, t.embeddings, t.lineitem, ..."""

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._cache: dict[str, pd.DataFrame] = {}

    def __getattr__(self, name: str) -> pd.DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = pd.read_parquet(
                os.path.join(self.sf_dir, f"{name}.parquet")
            )
        return self._cache[name]


# Production constants redeclared (checked against the real module by
# tools/replay_check.py — see REPLAY_CONSTANTS there).
COVERAGE_K = 10  # queries/text.py COVERAGE_K
RHO_SELECT_PCT = 25  # queries/text.py RHO_SELECT_PCT


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


# ---------------------------------------------------------------------------
# analytics
# ---------------------------------------------------------------------------


@replay("q_hodges_lehmann")
def r_hodges_lehmann(t: Tables) -> pd.DataFrame:
    """Median of ALL pairwise differences (en n_chars − non-en
    n_chars), by brute force on the value arrays — the textbook
    definition, no histograms, no prefix sums."""
    d = t.documents
    a = d.loc[d["lang"] == "en", "n_chars"].to_numpy(np.int64)
    b = d.loc[d["lang"] != "en", "n_chars"].to_numpy(np.int64)
    diffs = np.sort((a[:, None] - b[None, :]).ravel())
    n = diffs.size
    lower = int(diffs[(n + 1) // 2 - 1])  # 1-based rank ceil(n/2)
    upper = int(diffs[n // 2 + 1 - 1])  # 1-based rank floor(n/2)+1
    return pd.DataFrame(
        {
            "n_pairs": [n],
            "hl_lower": [lower],
            "hl_upper": [upper],
            "hl_shift": [(lower + upper) / 2.0],
        }
    )


@replay("q_coverage_greedy")
def r_coverage_greedy(t: Tables) -> pd.DataFrame:
    """Greedy max-coverage over distinct (doc, word-bigram) sets, the
    literal textbook loop over Python sets."""
    doc_sets: dict[int, set] = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        doc_sets[int(doc_id)] = {
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        }
    covered: set = set()
    rows = []
    remaining = dict(doc_sets)
    for r in range(1, COVERAGE_K + 1):
        best_doc, best_gain = None, 0
        for doc_id in sorted(remaining):
            gain = len(remaining[doc_id] - covered)
            if gain > best_gain:  # ties break on min doc_id via sort
                best_doc, best_gain = doc_id, gain
        if best_doc is None:
            break
        covered |= remaining.pop(best_doc)
        rows.append((r, best_doc, best_gain, len(covered)))
    return pd.DataFrame(
        rows, columns=["sel_order", "doc_id", "gain", "cum_coverage"]
    )


@replay("q_zipf_fit")
def r_zipf_fit(t: Tables) -> pd.DataFrame:
    """OLS of log(freq) on log(rank) via numpy polyfit-free closed
    form; rank = position in (freq desc, token asc) order."""
    counts: dict[str, int] = {}
    for text in t.documents["text"]:
        for tok in _tokens(text):
            counts[tok] = counts.get(tok, 0) + 1
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    c = np.array([v for _, v in items], dtype=np.float64)
    r = np.arange(1, len(items) + 1, dtype=np.float64)
    lx, ly = np.log(r), np.log(c)
    mx, my = lx.mean(), ly.mean()
    sxx = ((lx - mx) ** 2).sum()
    sxy = ((lx - mx) * (ly - my)).sum()
    syy = ((ly - my) ** 2).sum()
    slope = sxy / sxx
    intercept = my - slope * mx
    r2 = (sxy * sxy) / (sxx * syy)
    return pd.DataFrame(
        {
            "n_tokens_vocab": [len(items)],
            "zipf_slope": [round(slope, 4)],
            "zipf_intercept": [round(intercept, 4)],
            "r2": [round(r2, 4)],
        }
    )


@replay("q_rholoss_select")
def r_rholoss_select(t: Tables) -> pd.DataFrame:
    """RHO-loss-style selection: per-doc unigram cross-entropy (bits,
    corpus-unigram reference model), excess over the source mean,
    keep the global top 25% by (excess desc, doc_id asc)."""
    docs = t.documents
    doc_toks = {
        int(i): _tokens(s) for i, s in zip(docs["doc_id"], docs["text"])
    }
    counts: dict[str, int] = {}
    for toks in doc_toks.values():
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
    total = float(sum(counts.values()))
    src = dict(zip(docs["doc_id"].astype(int), docs["source"]))
    bits_e4: dict[int, int] = {}
    for doc_id, toks in doc_toks.items():
        if not toks:
            continue
        s = sum(-math.log2(counts[tok] / total) for tok in toks)
        v = (s / len(toks)) * 10000
        bits_e4[doc_id] = int(math.floor(v + 0.5))  # HALF_UP, values > 0
    by_src: dict[str, list[int]] = {}
    for doc_id, b in bits_e4.items():
        by_src.setdefault(src[doc_id], []).append(b)
    src_mean = {
        s: int(math.floor(sum(v) / len(v))) for s, v in by_src.items()
    }
    scored = sorted(
        (
            (doc_id, src[doc_id], b - src_mean[src[doc_id]])
            for doc_id, b in bits_e4.items()
        ),
        key=lambda x: (-x[2], x[0]),
    )
    k = len(scored) * RHO_SELECT_PCT // 100
    picked = scored[:k]
    out: dict[str, list[int]] = {}
    for _, s, e in picked:
        out.setdefault(s, []).append(e)
    return pd.DataFrame(
        sorted((s, len(v), sum(v)) for s, v in out.items()),
        columns=["source", "n_selected", "sum_excess_e4"],
    )


ACF_MAX_LAG = 7  # queries/analytics.py ACF_MAX_LAG
KM_HORIZON = "2024-01-31"  # queries/analytics.py KM_HORIZON
HILL_K = 200  # queries/analytics.py q_hill_tail local k
EB_SHORT_T = 300  # queries/analytics.py q_eb_shrinkage local T


def _money(col: pd.Series) -> np.ndarray:
    """Parquet money columns arrive as Decimal objects or float64."""
    return np.array([float(v) for v in col], dtype=np.float64)


@replay("q_hill_tail")
def r_hill_tail(t: Tables) -> pd.DataFrame:
    """Hill estimator, textbook form: alpha = k / sum ln(x_(i)/x_(k+1))
    over the k largest order totals (in exact cents, ties by
    o_orderkey ascending)."""
    o = t.orders
    cents = np.rint(_money(o["o_totalprice"]) * 100).astype(np.int64)
    keys = o["o_orderkey"].to_numpy(np.int64)
    order = np.lexsort((keys, -cents))[: HILL_K + 1]
    v = cents[order]
    thr = int(v[HILL_K])
    excess = float(np.log(v[:HILL_K].astype(np.float64)).sum()) - HILL_K * math.log(
        thr
    )
    return pd.DataFrame(
        {
            "k": [HILL_K],
            "threshold_cents": [thr],
            "mean_log_excess": [excess / HILL_K],
            "hill_alpha": [HILL_K / excess],
        }
    )


@replay("q_eb_shrinkage")
def r_eb_shrinkage(t: Tables) -> pd.DataFrame:
    """Beta-binomial empirical Bayes: method-of-moments prior from the
    per-source short-doc rates, posterior mean per source."""
    d = t.documents
    g = d.assign(short=(d["n_chars"] < EB_SHORT_T).astype(int)).groupby(
        "source"
    )
    per = g.agg(n_docs=("short", "size"), k_short=("short", "sum"))
    p = per["k_short"] / per["n_docs"]
    m1, m2 = p.mean(), (p * p).mean()
    mm = m1 * (1 - m1) / (m2 - m1 * m1) - 1
    alpha, beta = m1 * mm, (1 - m1) * mm
    return pd.DataFrame(
        {
            "source": per.index,
            "n_docs": per["n_docs"].to_numpy(np.int64),
            "k_short": per["k_short"].to_numpy(np.int64),
            "raw_rate": p.to_numpy(np.float64),
            "shrunk_rate": (
                (alpha + per["k_short"]) / (alpha + beta + per["n_docs"])
            ).to_numpy(np.float64),
        }
    )


def _daily_counts(t: Tables) -> pd.DataFrame:
    ev = t.events
    d = pd.to_datetime(ev["ts"]).dt.normalize()
    return (
        d.groupby(d).size().rename("x").reset_index().rename(columns={"ts": "d"})
    )


@replay("q_theilsen_trend")
def r_theilsen_trend(t: Tables) -> pd.DataFrame:
    """Theil-Sen: slope = lower median of all pairwise slopes,
    intercept = lower median of residuals x - slope*day."""
    days = _daily_counts(t)
    dn = (
        (days["d"] - pd.Timestamp("1970-01-01")).dt.days.to_numpy(np.int64)
    )
    x = days["x"].to_numpy(np.int64)
    i, j = np.triu_indices(len(dn), k=1)
    # pairs ordered (dn_i < dn_j) to mirror the dn2 > dn join
    slopes = (x[j] - x[i]).astype(np.float64) / (dn[j] - dn[i])
    order = np.lexsort((dn[j], dn[i], slopes))
    mid = (slopes.size + 1) // 2  # 1-based lower median
    slope = float(slopes[order[mid - 1]])
    resid = x.astype(np.float64) - slope * dn
    ro = np.lexsort((dn, resid))
    midd = (len(dn) + 1) // 2
    intercept = float(resid[ro[midd - 1]])
    return pd.DataFrame(
        {
            "n_days": [len(dn)],
            "n_pairs": [slopes.size],
            "slope": [slope],
            "intercept": [intercept],
        }
    )


@replay("q_kaplan_meier")
def r_kaplan_meier(t: Tables) -> pd.DataFrame:
    """Kaplan-Meier product-limit estimator, computed as the literal
    running product of (1 - d_t/n_t) — not the log-sum form the
    engines use."""
    ev = t.events
    ts = pd.to_datetime(ev["ts"])
    g = pd.DataFrame(
        {"user_id": ev["user_id"], "ts": ts, "p": ev["event_type"] == "purchase"}
    )
    per = g.groupby("user_id").agg(
        t0=("ts", "min"),
        tp=("ts", lambda s: s[g.loc[s.index, "p"]].min()),
    )
    horizon = pd.Timestamp(KM_HORIZON)
    end = per["tp"].fillna(horizon)
    dur = np.floor(
        (end - per["t0"]).dt.total_seconds().to_numpy() / 3600
    ).astype(np.int64)
    event = per["tp"].notna().to_numpy()
    n_total = len(per)
    rows = []
    surv = 1.0
    hit_zero = False
    at_risk = n_total
    for dt in np.sort(np.unique(dur)):
        mask = dur == dt
        d = int(event[mask].sum())
        leaving = int(mask.sum())
        if d > 0:
            if at_risk == d:
                hit_zero = True
            else:
                surv *= (at_risk - d) / at_risk
            rows.append((int(dt), d, at_risk, 0.0 if hit_zero else surv))
        at_risk -= leaving
    return pd.DataFrame(rows, columns=["dur_h", "d", "n_risk", "surv"])


@replay("q_ks_drift")
def r_ks_drift(t: Tables) -> pd.DataFrame:
    """Two-sample KS statistic: max |F_a - F_b| over observed values,
    tie on the smallest value attaining the max."""
    d = t.documents
    in_a = d["source"].str.len() == 4
    va = np.sort(d.loc[in_a, "n_chars"].to_numpy(np.int64))
    vb = np.sort(d.loc[~in_a, "n_chars"].to_numpy(np.int64))
    values = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(va, values, side="right") / va.size
    fb = np.searchsorted(vb, values, side="right") / vb.size
    diff = np.abs(fa - fb)
    best = int(np.argmax(diff))  # argmax returns FIRST max = smallest value
    return pd.DataFrame(
        {
            "n_a": [va.size],
            "n_b": [vb.size],
            "ks_d": [float(diff[best])],
            "at_value": [int(values[best])],
        }
    )


def _midranks(v: np.ndarray) -> np.ndarray:
    """Average ranks with ties (1-based), scipy-rankdata equivalent."""
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(v.size, dtype=np.float64)
    sv = v[order]
    i = 0
    while i < v.size:
        j = i
        while j + 1 < v.size and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


@replay("q_mannwhitney_u")
def r_mannwhitney_u(t: Tables) -> pd.DataFrame:
    """Mann-Whitney via textbook midranks over the pooled sample."""
    d = t.documents
    v = d["n_chars"].to_numpy(np.int64)
    en = (d["lang"] == "en").to_numpy()
    ranks = _midranks(v)
    n, n1 = v.size, int(en.sum())
    r1 = float(ranks[en].sum())
    rs2 = int(round(2 * r1))
    u2_en = rs2 - n1 * (n1 + 1)
    _, cnt = np.unique(v, return_counts=True)
    tie3 = int((cnt.astype(np.int64) ** 3 - cnt).sum())
    mean_r = n1 * (n1 + 1) / 2 + n1 * (n - n1) / 2
    var = (n1 * (n - n1) / 12.0) * ((n + 1) - tie3 / (n * (n - 1)))
    z = (r1 - mean_r) / math.sqrt(var)
    return pd.DataFrame(
        {
            "n_en": [n1],
            "n_other": [n - n1],
            "u2_en": [u2_en],
            "z": [z],
        }
    )


@replay("q_kruskal_wallis")
def r_kruskal_wallis(t: Tables) -> pd.DataFrame:
    """Kruskal-Wallis H with tie correction, textbook midranks."""
    d = t.documents
    v = d["n_chars"].to_numpy(np.int64)
    lang = d["lang"].to_numpy()
    ranks = _midranks(v)
    n = v.size
    _, cnt = np.unique(v, return_counts=True)
    tie3 = int((cnt.astype(np.int64) ** 3 - cnt).sum())
    rows = []
    s = 0.0
    for lg in np.unique(lang):
        m = lang == lg
        n_g = int(m.sum())
        r_g = float(ranks[m].sum())
        s += r_g * r_g / n_g
        rows.append((lg, n_g, int(round(2 * r_g)), r_g / n_g))
    h_raw = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    h_adj = h_raw / (1.0 - tie3 / (float(n) ** 3 - n))
    return pd.DataFrame(
        [(lg, n_g, rs2, mr, h_adj) for lg, n_g, rs2, mr in rows],
        columns=["lang", "n_docs", "rank_sum_x2", "mean_rank", "h_adj"],
    )


@replay("q_runs_test")
def r_runs_test(t: Tables) -> pd.DataFrame:
    """Wald-Wolfowitz runs test on the day-ordered binarized series."""
    days = _daily_counts(t).sort_values("d")
    x = days["x"].to_numpy(np.int64)
    dn = days["d"].to_numpy()
    order = np.lexsort((dn, x))
    med = int(x[order[(x.size + 1) // 2 - 1]])
    b = (x > med).astype(int)  # already day-ordered
    runs = 1 + int((b[1:] != b[:-1]).sum())
    n1, n2 = int(b.sum()), int((1 - b).sum())
    n = n1 + n2
    e_r = 1.0 + 2.0 * n1 * n2 / n
    var_r = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    z = 0.0 if var_r <= 0 else (runs - e_r) / math.sqrt(var_r)
    return pd.DataFrame(
        {
            "n_above": [n1],
            "n_below": [n2],
            "n_runs": [runs],
            "expected_runs": [e_r],
            "z": [z],
        }
    )


@replay("q_autocorrelation")
def r_autocorrelation(t: Tables) -> pd.DataFrame:
    """Pearson ACF at calendar lags 1..7, pairing day d with d+lag."""
    days = _daily_counts(t)
    by_day = dict(zip(days["d"], days["x"].astype(np.int64)))
    rows = []
    for lag in range(1, ACF_MAX_LAG + 1):
        xs, ys = [], []
        off = pd.Timedelta(days=lag)
        for d, x in by_day.items():
            y = by_day.get(d + off)
            if y is not None:
                xs.append(x)
                ys.append(y)
        xa = np.array(xs, dtype=np.float64)
        ya = np.array(ys, dtype=np.float64)
        npair = xa.size
        num = npair * (xa * ya).sum() - xa.sum() * ya.sum()
        vx = npair * (xa * xa).sum() - xa.sum() ** 2
        vy = npair * (ya * ya).sum() - ya.sum() ** 2
        den = math.sqrt(vx * vy)
        rows.append((lag, npair, 0.0 if den == 0 else num / den))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "acf"])


JK_GROUPS = 8  # queries/analytics.py JK_GROUPS
SINKHORN_BINS = 20  # queries/analytics.py SINKHORN_BINS
SINKHORN_ITERS = 10  # queries/analytics.py SINKHORN_ITERS
SHAPLEY_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))


@replay("q_jackknife_ci")
def r_jackknife_ci(t: Tables) -> pd.DataFrame:
    """Delete-one-group jackknife over g = orderkey % 8 groups."""
    o = t.orders
    price = _money(o["o_totalprice"])
    g = (o["o_orderkey"].to_numpy(np.int64) % JK_GROUPS)
    s_tot, n_tot = price.sum(), price.size
    means = np.array(
        [
            (s_tot - price[g == i].sum()) / (n_tot - (g == i).sum())
            for i in range(JK_GROUPS)
        ]
    )
    bar = means.mean()
    ss = ((means - bar) ** 2).sum()
    se = math.sqrt((JK_GROUPS - 1.0) / JK_GROUPS * ss)
    mean = s_tot / n_tot
    return pd.DataFrame(
        {
            "n_orders": [n_tot],
            "mean_price": [mean],
            "jk_se": [se],
            "ci_lo": [mean - 1.96 * se],
            "ci_hi": [mean + 1.96 * se],
        }
    )


@replay("q_wasserstein_drift")
def r_wasserstein_drift(t: Tables) -> pd.DataFrame:
    """W1 between discrete distributions = integral of |CDF gap|,
    computed here directly on the sorted distinct values."""
    d = t.documents
    en = d["lang"] == "en"
    a = d.loc[en, "n_chars"].to_numpy(np.int64)
    b = d.loc[~en, "n_chars"].to_numpy(np.int64)
    values = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), values, side="right").astype(object)
    cb = np.searchsorted(np.sort(b), values, side="right").astype(object)
    na, nb = int(a.size), int(b.size)
    gaps = np.diff(values).astype(object)
    num = sum(
        abs(int(ca[k]) * nb - int(cb[k]) * na) * int(gaps[k])
        for k in range(len(gaps))
    )
    return pd.DataFrame(
        {
            "n_en": [na],
            "n_other": [nb],
            "w1_num": [num],
            "w1_chars": [num / (na * nb)],
        }
    )


@replay("q_sinkhorn_ot")
def r_sinkhorn_ot(t: Tables) -> pd.DataFrame:
    """Sinkhorn-Knopp scaling with Gibbs kernel 2^-|i-j| over 20
    equi-width doc-length bins, 10 iterations — numpy matrix form
    (the engines unroll the folds)."""
    d = t.documents
    v = d["n_chars"].to_numpy(np.int64)
    en = (d["lang"] == "en").to_numpy()
    mn, mx = int(v.min()), int(v.max())
    i = np.floor((v - mn) * SINKHORN_BINS / float(mx - mn + 1)).astype(int)
    m = SINKHORN_BINS
    ca = np.bincount(i[en], minlength=m).astype(np.int64)
    cb = np.bincount(i[~en], minlength=m).astype(np.int64)
    pa, pb = ca / ca.sum(), cb / cb.sum()
    idx = np.arange(m)
    K = 1.0 / (1 << np.abs(idx[:, None] - idx[None, :]))
    vvec = np.ones(m)
    for _ in range(SINKHORN_ITERS):
        u = pa / (K @ vvec)
        vvec = pb / (K.T @ u)
    plan = u[:, None] * K * vvec[None, :]
    mass = plan.sum(axis=1)
    cost = float((plan * np.abs(idx[:, None] - idx[None, :])).sum())
    return pd.DataFrame(
        {
            "bin": idx.astype(np.int64),
            "n_en": ca,
            "n_other": cb,
            "u_scale": u,
            "v_scale": vvec,
            "row_mass": mass,
            "ot_cost_bins": np.full(m, cost),
        }
    )


@replay("q_shapley_attribution")
def r_shapley_attribution(t: Tables) -> pd.DataFrame:
    """Exact Shapley over the 2^4 exposure-set lattice; v(S) =
    empirical conversion rate of users whose exposure set is S."""
    ev = t.events
    c = len(SHAPLEY_CHANNELS)
    w = [
        math.factorial(s) * math.factorial(c - 1 - s) / math.factorial(c)
        for s in range(c)
    ]
    df = pd.DataFrame({"user_id": ev["user_id"], "et": ev["event_type"]})
    masks: dict = {}
    convs: dict = {}
    bit_of = dict(SHAPLEY_CHANNELS)
    for uid, et in zip(df["user_id"], df["et"]):
        if et == "purchase":
            convs[uid] = 1
        masks[uid] = masks.get(uid, 0) | bit_of.get(et, 0)
    nseg: dict[int, int] = {}
    kseg: dict[int, int] = {}
    for uid, mk in masks.items():
        nseg[mk] = nseg.get(mk, 0) + 1
        kseg[mk] = kseg.get(mk, 0) + convs.get(uid, 0)
    vseg = {mk: kseg[mk] / nseg[mk] for mk in nseg}
    rows = []
    for name, bit in SHAPLEY_CHANNELS:
        shap = 0.0
        for smask in range(1 << c):
            if smask & bit:
                continue
            shap += w[bin(smask).count("1")] * (
                vseg.get(smask + bit, 0.0) - vseg.get(smask, 0.0)
            )
        n_exposed = sum(n for mk, n in nseg.items() if mk & bit)
        rows.append((name, n_exposed, shap))
    return pd.DataFrame(rows, columns=["channel", "n_exposed", "shapley"])


@replay("q_holt_winters")
def r_holt_winters(t: Tables) -> pd.DataFrame:
    """Additive Holt-Winters m=7, alpha=beta=gamma=1/4, exact quarter
    units — plain Python loop over the day-ordered series."""
    days = _daily_counts(t).sort_values("d")
    xs = (days["x"].to_numpy(np.int64) * 4).tolist()
    n = len(xs)
    l = math.floor(sum(xs[:7]) / 7.0)
    b = 0
    s = [x - l for x in xs[:7]]
    sae = 0
    for i in range(8, n + 1):  # 1-based day index
        x = xs[i - 1]
        slot = (i - 1) % 7
        s_cur = s[slot]
        lb = l + b
        dl = math.floor((x - s_cur - lb) / 4.0)
        l = lb + dl
        b = b + math.floor(dl / 4.0)
        s[slot] = s_cur + math.floor((x - l - s_cur) / 4.0)
        sae += abs(x - (lb + s_cur))
    fc = l + b + s[n % 7]
    out = {
        "n_days": [n],
        "level_q": [l],
        "trend_q": [b],
        "sae_q": [sae],
        "forecast_next_q": [fc],
    }
    for j in range(7):
        out[f"season_q{j}"] = [s[j]]
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------

BURST_TOP = 20  # queries/text.py BURST_TOP
KMV_K = 256  # operators/sketch.py KMV_K


def _portable_hash(s: str, salt: str = "") -> int:
    """60-bit md5 prefix hash — reimplemented from the documented
    contract (operators/dedup.py docstring), not imported."""
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


@replay("q_heaps_law")
def r_heaps_law(t: Tables) -> pd.DataFrame:
    """Heaps' law: V(N) over the doc_id-ordered prefix curve, then OLS
    of log V on log N."""
    docs = t.documents.sort_values("doc_id")
    seen: set = set()
    ns, vs = [], []
    cum_n = 0
    for text in docs["text"]:
        toks = _tokens(text)
        cum_n += len(toks)
        seen.update(toks)
        ns.append(cum_n)
        vs.append(len(seen))
    lx = np.log(np.array(ns, dtype=np.float64))
    ly = np.log(np.array(vs, dtype=np.float64))
    mx, my = lx.mean(), ly.mean()
    sxx = ((lx - mx) ** 2).sum()
    sxy = ((lx - mx) * (ly - my)).sum()
    syy = ((ly - my) ** 2).sum()
    slope = sxy / sxx
    return pd.DataFrame(
        {
            "n_points": [len(ns)],
            "heaps_beta": [round(slope, 4)],
            "heaps_k": [round(math.exp(my - slope * mx), 4)],
            "r2": [round(sxy * sxy / (sxx * syy), 4)],
        }
    )


@replay("q_burstiness")
def r_burstiness(t: Tables) -> pd.DataFrame:
    """Fano factor (variance/mean over per-doc counts, zeros included)
    for the top-20 tokens by total count."""
    docs = t.documents
    n_docs = len(docs)
    per_tok: dict[str, list[int]] = {}
    for text in docs["text"]:
        c: dict[str, int] = {}
        for tok in _tokens(text):
            c[tok] = c.get(tok, 0) + 1
        for tok, k in c.items():
            per_tok.setdefault(tok, []).append(k)
    rows = []
    for tok, cs in per_tok.items():
        s1 = sum(cs)
        s2 = sum(k * k for k in cs)
        fano = (n_docs * s2 - s1 * s1) / (n_docs * s1)
        rows.append((tok, s1, len(cs), fano))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(
        rows[:BURST_TOP],
        columns=["token", "total_cnt", "n_docs_with", "fano"],
    )


@replay("q_naive_bayes")
def r_naive_bayes(t: Tables) -> pd.DataFrame:
    """Multinomial NB with add-one smoothing; label = planted concept
    (>= 2 'join' tokens). Confusion matrix over docs with tokens."""
    docs = t.documents
    doc_toks = [_tokens(s) for s in docs["text"]]
    ys = [int(toks.count("join") >= 2) for toks in doc_toks]
    ct1: dict[str, int] = {}
    ct0: dict[str, int] = {}
    for toks, y in zip(doc_toks, ys):
        d = ct1 if y else ct0
        for tok in toks:
            d[tok] = d.get(tok, 0) + 1
    vocab = set(ct1) | set(ct0)
    t1, t0, v = sum(ct1.values()), sum(ct0.values()), len(vocab)
    d1, d0 = sum(ys), len(ys) - sum(ys)
    prior = math.log(d1 / d0)
    conf: dict[tuple[int, int], int] = {}
    for toks, y in zip(doc_toks, ys):
        if not toks:
            continue  # token-join drops empty docs in the engines too
        s = sum(
            math.log((ct1.get(tok, 0) + 1) / (t1 + v))
            - math.log((ct0.get(tok, 0) + 1) / (t0 + v))
            for tok in toks
        )
        pred = int(s + prior > 0)
        conf[(y, pred)] = conf.get((y, pred), 0) + 1
    return pd.DataFrame(
        [(y, p, n) for (y, p), n in sorted(conf.items())],
        columns=["label", "pred", "n_docs"],
    )


@replay("q_token_entropy")
def r_token_entropy(t: Tables) -> pd.DataFrame:
    """Per-doc unigram Shannon entropy H = log2(T) - sum(c log2 c)/T."""
    docs = t.documents
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        if not toks:
            continue
        c: dict[str, int] = {}
        for tok in toks:
            c[tok] = c.get(tok, 0) + 1
        tcount = len(toks)
        slogs = sum(k * math.log2(k) for k in c.values())
        rows.append(
            (int(doc_id), tcount, len(c), math.log2(tcount) - slogs / tcount)
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_types", "entropy"]
    )


@replay("q_kmv_jaccard")
def r_kmv_jaccard(t: Tables) -> pd.DataFrame:
    """KMV sketch Jaccard between source vocabularies: k smallest
    distinct md5-prefix hashes per source; estimator = |both| / |union
    sketch| on the k smallest of the merged sketches."""
    docs = t.documents
    sketches: dict[str, list[int]] = {}
    vocab: dict[str, set] = {}
    for src, text in zip(docs["source"], docs["text"]):
        vocab.setdefault(src, set()).update(_tokens(text))
    for src, toks in vocab.items():
        hs = sorted({_portable_hash(tok, salt="kmv") for tok in toks})
        sketches[src] = hs[:KMV_K]
    rows = []
    for a in sorted(sketches):
        for b in sorted(sketches):
            if a >= b:
                continue
            sa, sb = set(sketches[a]), set(sketches[b])
            union_sorted = sorted(sa | sb)[:KMV_K]
            n_both = sum(1 for h in union_sorted if h in sa and h in sb)
            n_kept = len(union_sorted)
            rows.append((a, b, n_kept, n_both, n_both / n_kept))
    return pd.DataFrame(
        rows,
        columns=[
            "source_a",
            "source_b",
            "n_union_kept",
            "n_both",
            "est_jaccard",
        ],
    )


@replay("q_mixture_weights")
def r_mixture_weights(t: Tables) -> pd.DataFrame:
    d = t.documents
    counts = d.groupby("lang").size()
    total, n_langs = len(d), len(counts)
    return pd.DataFrame(
        {
            "lang": counts.index,
            "n_docs": counts.to_numpy(np.int64),
            "actual_frac": (counts / total).to_numpy(np.float64),
            "weight": (total / (n_langs * counts)).to_numpy(np.float64),
        }
    )


# ---------------------------------------------------------------------------
# similarity (embeddings table)
# ---------------------------------------------------------------------------

DIM = 64  # queries/similarity.py DIM
TOPK = 5  # queries/similarity.py TOPK
QUERY_MOD = 100  # queries/similarity.py QUERY_MOD
N_CENTROIDS = 16  # queries/similarity.py N_CENTROIDS
NPROBE = 2  # queries/similarity.py NPROBE
KMEANS_ITER = 3  # queries/similarity.py KMEANS_ITER
NEAR_T = 0.35  # queries/similarity.py NEAR_T
PQ_M = 8  # operators/similarity.py PQ_M
PQ_K = 16  # operators/similarity.py PQ_K


def _spark_round(x: float, d: int) -> float:
    """HALF_UP decimal rounding (Spark's round()) in floor form."""
    p = 10.0**d
    if x >= 0:
        return math.floor(x * p + 0.5) / p
    return -math.floor(-x * p + 0.5) / p


def _emb_matrix(t: Tables) -> tuple[np.ndarray, np.ndarray]:
    e = t.embeddings.sort_values("vec_id")
    ids = e["vec_id"].to_numpy(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in e["embedding"]])
    return ids, m


def _rounded_cos(q: np.ndarray, c: np.ndarray, d: int = 6) -> np.ndarray:
    """cos(q, rows of c), each value HALF_UP-rounded to d decimals."""
    qn = math.sqrt(float(q @ q))
    cn = np.sqrt((c * c).sum(axis=1))
    sims = (c @ q) / (qn * cn)
    p = 10.0**d
    return np.where(
        sims >= 0,
        np.floor(sims * p + 0.5) / p,
        -(np.floor(-sims * p + 0.5)) / p,
    )


def _topk_frame(
    ids: np.ndarray,
    m: np.ndarray,
    score_of,
    k: int,
    out_col: str,
    out_decimals: int = 4,
) -> pd.DataFrame:
    """Per query (vec_id % QUERY_MOD == 0): rank candidates by
    (rounded score desc, cand_id asc), keep top k."""
    rows = []
    for qi in np.nonzero(ids % QUERY_MOD == 0)[0]:
        sims = score_of(qi)
        mask = np.ones(len(ids), dtype=bool)
        mask[ids == ids[qi]] = False
        order = np.lexsort((ids[mask], -sims[mask]))
        cand_ids = ids[mask][order][:k]
        cand_sims = sims[mask][order][:k]
        for r, (cid, s) in enumerate(zip(cand_ids, cand_sims), start=1):
            rows.append(
                (int(ids[qi]), r, int(cid), _spark_round(float(s), out_decimals))
            )
    return pd.DataFrame(rows, columns=["query_id", "rank", "cand_id", out_col])


@replay("q_similarity_topk")
def r_similarity_topk(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    return _topk_frame(
        ids, m, lambda qi: _rounded_cos(m[qi], m), TOPK, "cos_sim"
    )


def _ivf_first_centroids(ids: np.ndarray, m: np.ndarray) -> list[tuple[int, np.ndarray]]:
    order = np.argsort(ids)[:N_CENTROIDS]
    return [(int(ids[i]), m[i]) for i in order]


def _assign(ids: np.ndarray, m: np.ndarray, cents) -> np.ndarray:
    """Nearest centroid by max 6-decimal-rounded cosine, first wins."""
    sims = np.stack([_rounded_cos(cv, m) for _, cv in cents])  # (C, N)
    best = sims.argmax(axis=0)  # first occurrence of max
    cids = np.array([cid for cid, _ in cents])
    return cids[best]


def _ivf_topk_replay(t: Tables, cents) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    list_id = _assign(ids, m, cents)
    cvecs = np.stack([cv for _, cv in cents])
    cids = np.array([cid for cid, _ in cents])
    rows = []
    for qi in np.nonzero(ids % QUERY_MOD == 0)[0]:
        csims = _rounded_cos(m[qi], cvecs)
        probe_order = np.lexsort((cids, -csims))[:NPROBE]
        probes = set(cids[probe_order].tolist())
        mask = np.isin(list_id, list(probes)) & (ids != ids[qi])
        sims = _rounded_cos(m[qi], m[mask])
        order = np.lexsort((ids[mask], -sims))[:TOPK]
        for r, oi in enumerate(order, start=1):
            rows.append(
                (
                    int(ids[qi]),
                    r,
                    int(ids[mask][oi]),
                    _spark_round(float(sims[oi]), 4),
                )
            )
    return pd.DataFrame(rows, columns=["query_id", "rank", "cand_id", "cos_sim"])


@replay("q_similarity_ivf_topk")
def r_similarity_ivf_topk(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    return _ivf_topk_replay(t, _ivf_first_centroids(ids, m))


def _half_away(num: int, den: int) -> int:
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((2 * (-num) + den) // (2 * den))


@replay("q_similarity_ivf_kmeans_topk")
def r_similarity_ivf_kmeans_topk(t: Tables) -> pd.DataFrame:
    """Exact-integer Lloyd (quantize 1e4, centroid scale 1e6), then the
    same IVF probe path."""
    ids, m = _emb_matrix(t)
    q = np.floor(m * 10000).astype(np.int64)  # (N, D)
    order = np.argsort(ids)[:N_CENTROIDS]
    cents = [q[i] * 100 for i in order]  # int64 arrays, scale 1e6
    for _ in range(KMEANS_ITER):
        c = np.stack(cents)  # (C, D) scale 1e6
        # dist(v, j) = sum over coords of (val*100 - cval)^2
        d = ((q[:, None, :] * 100 - c[None, :, :]).astype(np.float64) ** 2).sum(
            axis=2
        )
        # exact integers would overflow float? values ~1e6, squared 1e12,
        # * 64 coords ~ 6e13 — exact in float64 (< 2^53), argmin ties ->
        # lowest j via argmin's first-occurrence rule
        asg = d.argmin(axis=1)
        new = []
        for j in range(N_CENTROIDS):
            members = q[asg == j]
            if len(members) == 0:
                new.append(cents[j])
            else:
                s = members.sum(axis=0)
                n = len(members)
                new.append(
                    np.array(
                        [_half_away(int(x) * 100, n) for x in s], dtype=np.int64
                    )
                )
        cents = new
    cent_list = [
        (j, cents[j].astype(np.float64) / 1e6) for j in range(N_CENTROIDS)
    ]
    return _ivf_topk_replay(t, cent_list)


def _pq_codebook_replay(ids: np.ndarray, m: np.ndarray) -> np.ndarray:
    """(M, K, sub): codeword j of subspace s = slice of j-th lowest-id
    vector."""
    sub = DIM // PQ_M
    order = np.argsort(ids)[:PQ_K]
    cb = np.empty((PQ_M, PQ_K, sub))
    for s in range(PQ_M):
        for j, oi in enumerate(order):
            cb[s, j] = m[oi, s * sub : (s + 1) * sub]
    return cb


def _pq_encode_replay(m: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin 6-decimal-rounded L2^2 per subspace, ties -> lowest code."""
    sub = DIM // PQ_M
    n = m.shape[0]
    codes = np.empty((n, PQ_M), dtype=np.int64)
    for s in range(PQ_M):
        seg = m[:, s * sub : (s + 1) * sub]
        d = ((seg[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        p = 1e6
        d = np.floor(d * p + 0.5) / p  # d >= 0 always
        codes[:, s] = d.argmin(axis=1)
    return codes


@replay("q_pq_codes")
def r_pq_codes(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    codes = _pq_encode_replay(m, _pq_codebook_replay(ids, m))
    return pd.DataFrame(
        {
            "vec_id": ids,
            "code_str": ["-".join(str(c) for c in row) for row in codes],
            "code_sum": codes.sum(axis=1),
        }
    )


@replay("q_pq_adc_topk")
def r_pq_adc_topk(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    cb = _pq_codebook_replay(ids, m)
    codes = _pq_encode_replay(m, cb)
    sub = DIM // PQ_M
    recon = np.empty_like(m)
    for s in range(PQ_M):
        recon[:, s * sub : (s + 1) * sub] = cb[s][codes[:, s]]
    rows = []
    for qi in np.nonzero(ids % QUERY_MOD == 0)[0]:
        qv = m[qi]
        qn = math.sqrt(float(qv @ qv))
        cn = np.sqrt((recon * recon).sum(axis=1))
        sims = (recon @ qv) / (qn * cn)
        p = 1e6
        sims = np.where(
            sims >= 0, np.floor(sims * p + 0.5) / p, -(np.floor(-sims * p + 0.5)) / p
        )
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], -sims[mask]))[:TOPK]
        for r, oi in enumerate(order, start=1):
            s4 = _spark_round(float(sims[mask][oi]), 4)
            rows.append((int(ids[qi]), r, int(ids[mask][oi]), _spark_round(s4, 2)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "cand_id", "adc2"])


@replay("q_semdedup")
def r_semdedup(t: Tables) -> pd.DataFrame:
    """Keep-first semantic dedup within coarse clusters: drop a vector
    iff a lower-id vector in its cluster has rounded cosine >= 0.35."""
    ids, m = _emb_matrix(t)
    cents = _ivf_first_centroids(ids, m)
    list_id = _assign(ids, m, cents)
    order = np.argsort(ids)
    dropped = set()
    for lid in np.unique(list_id):
        idx = order[list_id[order] == lid]
        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                a, b = idx[ai], idx[bi]
                cos = float(m[a] @ m[b]) / (
                    math.sqrt(float(m[a] @ m[a])) * math.sqrt(float(m[b] @ m[b]))
                )
                if _spark_round(cos, 4) >= NEAR_T:
                    dropped.add(int(ids[b]))
    return pd.DataFrame(
        {
            "vec_id": ids,
            "list_id": list_id,
            "is_dropped": [int(i) in dropped for i in ids],
        }
    )


@replay("q_auc_score")
def r_auc_score(t: Tables) -> pd.DataFrame:
    """Exact AUC via the probability interpretation: mean over all
    (pos, neg) pairs of [score_p > score_n] + 0.5 [ties] — NOT the
    rank-sum shortcut the engines use."""
    e = t.embeddings
    score = np.array([float(v[0]) for v in e["embedding"]])
    pos = (e["label"].to_numpy() < 5)
    sp, sn = np.sort(score[pos]), np.sort(score[~pos])
    gt = np.searchsorted(sn, sp, side="left").sum()  # n_neg strictly below
    eqs = (
        np.searchsorted(sn, sp, side="right") - np.searchsorted(sn, sp, side="left")
    ).sum()
    auc = (gt + 0.5 * eqs) / (sp.size * sn.size)
    return pd.DataFrame(
        {"n_pos": [sp.size], "n_neg": [sn.size], "auc": [auc]}
    )


def _cal_bins(t: Tables) -> pd.DataFrame:
    e = t.embeddings
    score = np.array([float(v[0]) for v in e["embedding"]])
    pos = (e["label"].to_numpy() < 5).astype(np.int64)
    lo, hi = score.min(), score.max()
    b = np.minimum(9, np.floor((score - lo) / (hi - lo) * 10)).astype(np.int64)
    return pd.DataFrame({"bin": b, "pos": pos})


@replay("q_calibration_bins")
def r_calibration_bins(t: Tables) -> pd.DataFrame:
    df = _cal_bins(t)
    g = df.groupby("bin").agg(n=("pos", "size"), n_pos=("pos", "sum"))
    return pd.DataFrame(
        {
            "bin": g.index.to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "n_pos": g["n_pos"].to_numpy(np.int64),
            "pos_rate": (g["n_pos"] / g["n"]).to_numpy(np.float64),
        }
    )


@replay("q_brier_score")
def r_brier_score(t: Tables) -> pd.DataFrame:
    """Brier of the bin-rate predictor, computed the direct way: mean
    over items of (p_bin - y)^2; uncertainty/resolution from the
    Murphy decomposition definitions."""
    df = _cal_bins(t)
    g = df.groupby("bin").agg(n=("pos", "size"), n_pos=("pos", "sum"))
    p_of = (g["n_pos"] / g["n"]).to_dict()
    p = df["bin"].map(p_of).to_numpy(np.float64)
    y = df["pos"].to_numpy(np.float64)
    brier = float(((p - y) ** 2).mean())
    pbar = float(y.mean())
    unc = pbar * (1 - pbar)
    return pd.DataFrame(
        {
            "n_items": [len(df)],
            "brier": [brier],
            "uncertainty": [unc],
            "resolution": [unc - brier],
        }
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

MINHASH_K = 16  # queries/dedup.py K
MINHASH_BANDS = 4  # queries/dedup.py BANDS
MINHASH_N = 3  # queries/dedup.py MINHASH_N
MINHASH_T = 0.5  # queries/dedup.py MINHASH_T
SIMHASH_BITS = 48  # queries/dedup.py SIMHASH_BITS
ALLPAIRS_T = 0.6  # queries/dedup.py ALLPAIRS_T
ALLPAIRS_N = 5  # queries/dedup.py ALLPAIRS_N
SPLIT_MOD = 10000  # queries/dedup.py SPLIT_MOD
SPLIT_TRAIN = 9000  # queries/dedup.py SPLIT_TRAIN
SPLIT_VAL = 9500  # queries/dedup.py SPLIT_VAL
DBSCAN_EPS = 0.02  # queries/similarity.py DBSCAN_EPS
DBSCAN_MINPTS = 5  # queries/similarity.py DBSCAN_MINPTS


def _perm_constants(k: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"perm|{j}".encode()).hexdigest()[:15], 16)
        for j in range(k)
    ]


def _shingles(text: str, n: int) -> list[str]:
    """Word n-grams over the RAW split (empty tokens kept — the
    operator splits without filtering); docs shorter than n have
    none."""
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _minhash_sig(text: str, k: int, n: int) -> list[int] | None:
    sh = _shingles(text, n)
    if not sh:
        return None
    hs = [_portable_hash(s) for s in sh]
    return [min(h ^ c for h in hs) for c in _perm_constants(k)]


def _minhash_pairs_replay(t: Tables) -> list[tuple[int, int, float]]:
    """(doc_a, doc_b, est_jaccard) for every banded candidate pair with
    est >= MINHASH_T; est = matching minhashes / k, HALF_UP 4dp."""
    docs = t.documents
    sigs: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        s = _minhash_sig(text, MINHASH_K, MINHASH_N)
        if s is not None:
            sigs[int(doc_id)] = s
    r = MINHASH_K // MINHASH_BANDS
    buckets: dict[tuple[int, tuple], list[int]] = {}
    for doc_id, s in sigs.items():
        for bi in range(MINHASH_BANDS):
            key = (bi, tuple(s[bi * r : (bi + 1) * r]))
            buckets.setdefault(key, []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for a, b in sorted(pairs):
        match = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        est = _spark_round(match / MINHASH_K, 4)
        if est >= MINHASH_T:
            out.append((a, b, est))
    return out


@replay("q_dedup_minhash_pairs")
def r_dedup_minhash_pairs(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        _minhash_pairs_replay(t), columns=["doc_a", "doc_b", "est_jaccard"]
    )


def _components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find connected components; label = min member id."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@replay("q_dedup_clusters")
def r_dedup_clusters(t: Tables) -> pd.DataFrame:
    comp = _components([(a, b) for a, b, _ in _minhash_pairs_replay(t)])
    return pd.DataFrame(
        sorted(comp.items()), columns=["doc_id", "cluster_id"]
    )


@replay("q_leakage_safe_split")
def r_leakage_safe_split(t: Tables) -> pd.DataFrame:
    comp = _components([(a, b) for a, b, _ in _minhash_pairs_replay(t)])
    rows = []
    for doc_id in t.documents["doc_id"].astype(int):
        rep = comp.get(doc_id, doc_id)
        bucket = _portable_hash(str(rep), salt="clsplit") % SPLIT_MOD
        split = (
            "train"
            if bucket < SPLIT_TRAIN
            else ("val" if bucket < SPLIT_VAL else "test")
        )
        rows.append((doc_id, rep, split))
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep", "split"])


@replay("q_dedup_simhash")
def r_dedup_simhash(t: Tables) -> pd.DataFrame:
    docs = t.documents
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        if not toks:
            continue
        votes = [0] * SIMHASH_BITS
        for tok in toks:
            h = _portable_hash(tok)
            for b in range(SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        fp = sum(1 << b for b in range(SIMHASH_BITS) if votes[b] >= 0)
        rows.append((int(doc_id), fp))
    return pd.DataFrame(rows, columns=["doc_id", "simhash"])


@replay("q_allpairs_jaccard")
def r_allpairs_jaccard(t: Tables) -> pd.DataFrame:
    """Brute-force exact all-pairs Jaccard over distinct 5-gram sets —
    the completeness standard the prefix-filtered operator must
    reproduce."""
    docs = t.documents
    sets: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        sh = set(_shingles(text, ALLPAIRS_N))
        if sh:
            sets[int(doc_id)] = sh
    # exactness-preserving candidate index: a pair with inter > 0
    # shares at least one shingle, so enumerating co-occurring doc
    # pairs per shingle loses nothing (pure speedup over the N^2 loop)
    by_sh: dict[str, list[int]] = {}
    for doc_id in sorted(sets):
        for sh in sets[doc_id]:
            by_sh.setdefault(sh, []).append(doc_id)
    cand: set[tuple[int, int]] = set()
    for ds in by_sh.values():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(cand):
        inter = len(sets[a] & sets[b])
        jac = _spark_round(inter / (len(sets[a]) + len(sets[b]) - inter), 4)
        if jac >= ALLPAIRS_T:
            rows.append((a, b, len(sets[a]), len(sets[b]), inter, jac))
    return pd.DataFrame(
        rows, columns=["doc_a", "doc_b", "n_a", "n_b", "inter", "jaccard"]
    )


@replay("q_dbscan_grid")
def r_dbscan_grid(t: Tables) -> pd.DataFrame:
    """Textbook DBSCAN on (x, y) = first two embedding coords:
    brute-force eps-neighborhoods, core = (|N_eps| + self) >= minPts,
    clusters = components of the core graph labeled by min core id,
    borders attach to their min core cluster."""
    e = t.embeddings
    ids = e["vec_id"].to_numpy(np.int64)
    x = np.array([float(v[0]) for v in e["embedding"]])
    y = np.array([float(v[1]) for v in e["embedding"]])
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    n = len(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    nbr = (d2 <= eps2) & ~np.eye(n, dtype=bool)
    is_core = (nbr.sum(axis=1) + 1) >= DBSCAN_MINPTS
    core_idx = np.nonzero(is_core)[0]
    core_pairs = [
        (int(ids[i]), int(ids[j]))
        for i in core_idx
        for j in core_idx
        if i < j and nbr[i, j]
    ]
    comp = _components(core_pairs)
    rows = []
    for i in range(n):
        vid = int(ids[i])
        if is_core[i]:
            rows.append((vid, "core", comp.get(vid, vid)))
        else:
            core_nbrs = [
                comp.get(int(ids[j]), int(ids[j]))
                for j in np.nonzero(nbr[i] & is_core)[0]
            ]
            if core_nbrs:
                rows.append((vid, "border", min(core_nbrs)))
            else:
                rows.append((vid, "noise", None))
    return pd.DataFrame(rows, columns=["vec_id", "role", "cluster_id"])


@replay("q_dedup_exact")
def r_dedup_exact(t: Tables) -> pd.DataFrame:
    g = t.documents.groupby("text").size()
    return pd.DataFrame(
        {
            "n_distinct_texts": [len(g)],
            "n_docs": [int(g.sum())],
            "n_dup_docs": [int((g - 1).sum())],
        }
    )


@replay("q_dedup_exact_keep")
def r_dedup_exact_keep(t: Tables) -> pd.DataFrame:
    import hashlib

    d = t.documents
    g = d.assign(fp=d["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest()))
    agg = g.groupby("fp").agg(
        keep_id=("doc_id", "min"), dup_cnt=("doc_id", "size")
    )
    return agg.reset_index()


# ---------------------------------------------------------------------------
# multimodal: dHash banding from the closed-form media contract
# ---------------------------------------------------------------------------
# The synthetic media payloads encode pixels that are a CLOSED FORM of
# (doc_id, frame, tile) — the test-data generator contract stated in
# operators/jpeg.py / operators/video.py. Re-deriving fingerprints from
# that contract (never from the engine's decode or the oracle's SQL)
# third-implements the decode -> dHash -> banding -> cap -> histogram
# chain end to end: if the real JPEG/AVI decode produced different
# pixels, or the banding/cap/hamming logic drifted, these mismatch.

IMAGE_BAND_CAP = 96  # queries/multimodal.py IMAGE_BAND_CAP
VIDEO_BAND_CAP = 128  # queries/multimodal.py VIDEO_BAND_CAP


def _dhash_closed_form(doc_id: int, frame: int | None = None) -> tuple[int, int]:
    """9x8 dHash halves from the closed-form tile pixels."""
    w = 8 * (doc_id % 4 + 2)
    h = 8 * (doc_id % 3 + 2)
    base = doc_id * 11 + (0 if frame is None else frame * 53)
    v = [
        [
            (base + (((j * h // 8) // 8) * (w // 8) + ((i * w // 9) // 8)) * 37)
            % 256
            for i in range(9)
        ]
        for j in range(8)
    ]
    h1 = h2 = 0
    for j in range(8):
        for i in range(8):
            if v[j][i + 1] > v[j][i]:
                if j < 4:
                    h1 |= 1 << (j * 8 + i)
                else:
                    h2 |= 1 << ((j - 4) * 8 + i)
    return h1, h2


def _bands_of(h1: int, h2: int) -> list[tuple[int, int]]:
    return [
        (0, h1 >> 16),
        (1, h1 & 0xFFFF),
        (2, h2 >> 16),
        (3, h2 & 0xFFFF),
    ]


def _banded_pairs(items: list[tuple], cap: int, key=None) -> set[tuple]:
    """items: (key..., h1, h2). Returns distinct candidate pairs
    (a, b) sharing any band whose bucket size <= cap, with
    ``key(a) < key(b)`` (default: first element)."""
    key = key or (lambda it: it[0])
    buckets: dict[tuple[int, int], list] = {}
    for it in items:
        h1, h2 = it[-2], it[-1]
        for band in _bands_of(h1, h2):
            buckets.setdefault(band, []).append(it)
    pairs: set[tuple] = set()
    for members in buckets.values():
        if len(members) > cap:
            continue  # hot-bucket guard
        for x in range(len(members)):
            for y in range(len(members)):
                a, b = members[x], members[y]
                if key(a) < key(b):
                    pairs.add((a, b))
    return pairs


@replay("q_image_dhash_dedup")
def r_image_dhash_dedup(t: Tables) -> pd.DataFrame:
    items = [
        (int(d),) + _dhash_closed_form(int(d))
        for d in t.documents["doc_id"]
    ]
    hist: dict[int, int] = {}
    for a, b in _banded_pairs(items, IMAGE_BAND_CAP):
        ham = bin(a[1] ^ b[1]).count("1") + bin(a[2] ^ b[2]).count("1")
        if ham <= 16:
            hist[ham] = hist.get(ham, 0) + 1
    return pd.DataFrame(
        sorted(hist.items()), columns=["hamming", "n_pairs"]
    )


def _video_frames_fp(t: Tables) -> list[tuple]:
    items = []
    for d in t.documents["doc_id"]:
        d = int(d)
        for fi in range(d % 3 + 2):
            h1, h2 = _dhash_closed_form(d, frame=fi)
            items.append((d, fi, h1, h2))
    return items


@replay("q_video_near_dup")
def r_video_near_dup(t: Tables) -> pd.DataFrame:
    items = [((d, fi), h1, h2) for d, fi, h1, h2 in _video_frames_fp(t)]
    per_pair: dict[tuple[int, int], int] = {}
    # candidate rule is video_a < video_b (never frame pairs within
    # one video), so compare on the VIDEO id, not the (video, frame)
    # tuple
    for a, b in _banded_pairs(items, VIDEO_BAND_CAP, key=lambda it: it[0][0]):
        (da, _), h1a, h2a = a
        (db, _), h1b, h2b = b
        ham = bin(h1a ^ h1b).count("1") + bin(h2a ^ h2b).count("1")
        if ham <= 10:
            per_pair[(da, db)] = per_pair.get((da, db), 0) + 1
    hist: dict[int, int] = {}
    for n in per_pair.values():
        hist[n] = hist.get(n, 0) + 1
    return pd.DataFrame(
        sorted(hist.items()), columns=["n_matched", "n_video_pairs"]
    )


def _audio_fp_from_text(text: str) -> int:
    body = text.encode("utf-8")
    energies = []
    for w in range(33):
        seg = body[w * 16 : (w + 1) * 16]
        energies.append(sum(x * x for x in seg))
    fp = 0
    for w in range(32):
        if energies[w + 1] > energies[w]:
            fp |= 1 << w
    return fp


def _manifest_rows(t: Tables) -> pd.DataFrame:
    rows = []
    for d, text in zip(t.documents["doc_id"], t.documents["text"]):
        d = int(d)
        h1, h2 = _dhash_closed_form(d)
        rows.append(("image", d, 0, h1, h2))
        for fi in range(d % 3 + 2):
            v1, v2 = _dhash_closed_form(d, frame=fi)
            rows.append(("video", d, fi, v1, v2))
        if d % 3 == 1:  # media_with_headers audio branch
            rows.append(("audio", d, 0, _audio_fp_from_text(str(text)), 0))
    return pd.DataFrame(
        rows, columns=["kind", "media_id", "frame_idx", "h1", "h2"]
    )


@replay("q_media_fingerprint_manifest")
def r_media_fingerprint_manifest(t: Tables) -> pd.DataFrame:
    return _manifest_rows(t)


@replay("q_media_manifest_ivm")
def r_media_manifest_ivm(t: Tables) -> pd.DataFrame:
    """The incremental manifest must equal the full rebuild — same
    closed-form expectation as q_media_fingerprint_manifest."""
    return _manifest_rows(t)


# ---------------------------------------------------------------------------
# round-11 extension batch: dq / analytics / text scans
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}  # operators/text.py LANG_MARKERS
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"  # operators/text.py
CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@replay("q_benford_audit")
def r_benford_audit(t: Tables) -> pd.DataFrame:
    """Benford first-digit audit: P(d) = log10(1 + 1/d)."""
    digits = [
        int(str(v)[0])
        for v in t.orders["o_totalprice"]
        if str(v)[0].isdigit() and str(v)[0] != "0"
    ]
    n = len(digits)
    rows = []
    for d in sorted(set(digits)):
        n_obs = digits.count(d)
        share_obs = n_obs * 10000 / n
        share_ben = round(math.log10(1 + 1 / d) * 10000, 4)
        chi2 = (share_obs - share_ben) ** 2 / share_ben * 1000
        rows.append((d, n_obs, share_obs, share_ben, chi2))
    return pd.DataFrame(
        rows,
        columns=["digit", "n_obs", "share_obs", "share_benford", "chi2_x1000"],
    )


@replay("q_gini_concentration")
def r_gini_concentration(t: Tables) -> pd.DataFrame:
    """Gini of per-customer spend from the closed form
    G = (2*sum(rank*s) - (n+1)*sum(s)) / (n*sum(s)), ranks 1-based in
    (spend, custkey) order."""
    from fractions import Fraction

    o = t.orders
    spend: dict[int, Fraction] = {}
    for ck, p in zip(o["o_custkey"], o["o_totalprice"]):
        spend[int(ck)] = spend.get(int(ck), Fraction(0)) + Fraction(str(p))
    items = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    b = sum(s for _, s in items)
    a = sum((i + 1) * s for i, (_, s) in enumerate(items))
    gini = float((2 * a - (n + 1) * b) / (n * b))
    return pd.DataFrame(
        {
            "n_customers": [n],
            "total_spend": [float(b)],
            "gini": [gini],
        }
    )


@replay("q_mad_anomalies")
def r_mad_anomalies(t: Tables) -> pd.DataFrame:
    """Median/MAD as exact lower order statistics at rank ceil(n/2);
    anomaly iff |v - med| > 3 * MAD."""
    ev = t.events
    rows = []
    for et in sorted(ev["event_type"].unique()):
        v = np.sort(ev.loc[ev["event_type"] == et, "value"].to_numpy(np.float64))
        n = v.size
        med = float(v[math.ceil(n * 0.5) - 1])
        d = np.sort(np.abs(v - med))
        mad = float(d[math.ceil(n * 0.5) - 1])
        rows.append((et, n, med, mad, int((np.abs(v - med) > 3 * mad).sum())))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_total", "median_value", "mad", "n_anomalies"],
    )


@replay("q_group_ttest")
def r_group_ttest(t: Tables) -> pd.DataFrame:
    """Welch's t per event type, week 1 vs week 2."""
    ev = t.events
    ts = pd.to_datetime(ev["ts"])
    in2 = ts < pd.Timestamp("2024-01-15")
    wk1 = ts < pd.Timestamp("2024-01-08")
    rows = []
    for et in sorted(ev["event_type"].unique()):
        m = (ev["event_type"] == et) & in2
        v1 = ev.loc[m & wk1, "value"].to_numpy(np.float64)
        v2 = ev.loc[m & ~wk1, "value"].to_numpy(np.float64)
        n1, n2 = v1.size, v2.size
        var1 = (np.sum(v1 * v1) - v1.sum() ** 2 / n1) / (n1 - 1)
        var2 = (np.sum(v2 * v2) - v2.sum() ** 2 / n2) / (n2 - 1)
        tstat = (v1.mean() - v2.mean()) / math.sqrt(var1 / n1 + var2 / n2)
        rows.append((et, n1, n2, v1.mean(), v2.mean(), tstat))
    return pd.DataFrame(
        rows, columns=["event_type", "n1", "n2", "mean1", "mean2", "t_stat"]
    )


@replay("q_token_count")
def r_token_count(t: Tables) -> pd.DataFrame:
    import re

    pat = re.compile(BPE_ISH_PATTERN)
    d = t.documents
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].astype(np.int64),
            "n_tokens": [len(_tokens(s)) for s in d["text"]],
            "n_bpe_ish": [len(pat.findall(s)) for s in d["text"]],
            "n_chars_actual": [len(s) for s in d["text"]],
        }
    )


@replay("q_lang_id")
def r_lang_id(t: Tables) -> pd.DataFrame:
    """Stopword-hit argmax; ties break to the first language in sorted
    code order; 'und' when no marker hits."""
    d = t.documents
    rows = []
    for doc_id, lang, text in zip(d["doc_id"], d["lang"], d["text"]):
        toks = text.split(" ")  # raw split, engine parity
        hits = {
            lg: sum(1 for tok in toks if tok in mk)
            for lg, mk in LANG_MARKERS.items()
        }
        best = max(hits.values())
        guess = "und"
        if best > 0:
            guess = min(lg for lg, h in hits.items() if h == best)
        rows.append(
            (int(doc_id), lang, guess)
            + tuple(hits[lg] for lg in sorted(LANG_MARKERS))
        )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "lang_declared", "lang_guess"]
        + [f"hits_{lg}" for lg in sorted(LANG_MARKERS)],
    )


@replay("q_numeric_corr")
def r_numeric_corr(t: Tables) -> pd.DataFrame:
    """Pairwise Pearson from exact integer cents moments (arbitrary-
    precision Python ints), final formula in float64."""
    li = t.lineitem
    cents = [
        np.rint(_money(li[c]) * 100).astype(object) for c in CORR_COLS
    ]
    n = len(li)
    s = [int(sum(c)) for c in cents]
    p = {}
    for i in range(4):
        for j in range(i, 4):
            p[(i, j)] = int(sum(a * b for a, b in zip(cents[i], cents[j])))
    rows = []
    for i in range(4):
        for j in range(i + 1, 4):
            num = float(n * p[(i, j)] - s[i] * s[j])
            den = math.sqrt(
                float(n * p[(i, i)] - s[i] * s[i])
                * float(n * p[(j, j)] - s[j] * s[j])
            )
            rows.append((CORR_COLS[i], CORR_COLS[j], num / den))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "pearson_r"])


# ---------------------------------------------------------------------------
# round-12 wave: statistical-inference family (VERDICT r11 item 1)
# ---------------------------------------------------------------------------

# Production constants redeclared (checked by replay_check.py).
SPRT_P0 = 0.19  # queries/analytics.py SPRT_P0
SPRT_P1 = 0.21  # queries/analytics.py SPRT_P1
SPRT_ALPHA = 0.05  # queries/analytics.py SPRT_ALPHA
SPRT_BETA = 0.05  # queries/analytics.py SPRT_BETA
RDD_CUTOFF_C = 25_000_000  # queries/analytics.py RDD_CUTOFF_C
RDD_BW_C = 10_000_000  # queries/analytics.py RDD_BW_C
RBO_K = 20  # queries/text.py RBO_K
RBO_P = 0.9  # queries/text.py RBO_P
MI_TOPK = 20  # queries/text.py MI_TOPK
MAP_K = 20  # queries/text.py MAP_K
MAP_QUERIES = ("scan", "merge", "sort")  # queries/text.py MAP_QUERIES
MAP_REL_TERM = "join"  # queries/text.py MAP_REL_TERM
DD_SUB = 16  # operators/sketch.py DD_SUB


def _trunc_cents(col: pd.Series) -> np.ndarray:
    """CAST(money * 100 AS BIGINT): IEEE multiply then truncate toward
    zero — the engines truncate the SAME double, so the replay must
    too (np.rint here would be a different operator)."""
    return np.trunc(_money(col) * 100.0).astype(np.int64)


def _dec_cents(col: pd.Series) -> np.ndarray:
    """CAST(money AS DECIMAL(18,2)) * 100: HALF_UP on the double's
    shortest decimal repr (BigDecimal.valueOf semantics = Python repr)."""
    from decimal import ROUND_HALF_UP, Decimal

    return np.array(
        [
            int(
                Decimal(repr(float(v))).scaleb(2).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
            for v in col
        ],
        dtype=np.int64,
    )


def _round_cents(col: pd.Series) -> np.ndarray:
    """round(money * 100): HALF_UP on the shortest repr of the IEEE
    product (Spark F.round / DuckDB round on a double)."""
    from decimal import ROUND_HALF_UP, Decimal

    return np.array(
        [
            int(
                Decimal(repr(float(v) * 100.0)).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
            for v in col
        ],
        dtype=np.int64,
    )


def _ftoks(text: str) -> list[str]:
    """split(' ') with empties dropped — the engines' filtered-token
    array."""
    return [x for x in text.split(" ") if x != ""]


def _half_away_ratio(num: int, den: int, scale: int) -> float:
    """Exact half-away-from-zero decimal ratio (dec_ratio twin) on
    Python ints; num may be any sign, den > 0."""
    p = 10**scale
    if num >= 0:
        q = (2 * num * p + den) // (2 * den)
    else:
        q = -((2 * (-num) * p + den) // (2 * den))
    return q / float(p)


@replay("q_cuped_adjust")
def r_cuped_adjust(t: Tables) -> pd.DataFrame:
    """CUPED (Deng et al. 2013) from first principles: per-customer
    pre/post whole-dollar spend, theta = cov(x,y)/var(x),
    var_reduction = corr(x,y)^2 — moments as exact Python ints."""
    o = t.orders
    dollars = _trunc_cents(o["o_totalprice"]) // 100
    pre = (o["o_orderdate"] < pd.Timestamp("1998-01-01")).to_numpy()
    cust = o["o_custkey"].to_numpy(np.int64)
    agg: dict[int, list[int]] = {}
    for ck, dv, is_pre in zip(cust, dollars, pre):
        xy = agg.setdefault(int(ck), [0, 0])
        xy[0 if is_pre else 1] += int(dv)
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    n = len(agg)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    cov = float(n) * float(sxy) - float(sx) * float(sy)
    varx = float(n) * float(sxx) - float(sx) * float(sx)
    vary = float(n) * float(syy) - float(sy) * float(sy)
    return pd.DataFrame(
        {
            "n_customers": [n],
            "theta": [cov / varx],
            "var_reduction": [cov * cov / (varx * vary)],
        }
    )


@replay("q_diff_in_diff")
def r_diff_in_diff(t: Tables) -> pd.DataFrame:
    """Two-period DiD: four cell means of exact cents, effect =
    (treat_post - treat_pre) - (ctrl_post - ctrl_pre)."""
    o, c = t.orders, t.customer
    treat_of = {
        int(k): int(seg == "BUILDING")
        for k, seg in zip(c["c_custkey"], c["c_mktsegment"])
    }
    cents = _trunc_cents(o["o_totalprice"])
    post = (o["o_orderdate"] >= pd.Timestamp("1998-01-01")).to_numpy()
    s = {(tt, pp): 0 for tt in (0, 1) for pp in (0, 1)}
    nn = {(tt, pp): 0 for tt in (0, 1) for pp in (0, 1)}
    for ck, cv, pp in zip(o["o_custkey"], cents, post):
        key = (treat_of[int(ck)], int(pp))
        s[key] += int(cv)
        nn[key] += 1
    mean = {k: s[k] / (100.0 * nn[k]) for k in s}
    return pd.DataFrame(
        {
            "n00": [nn[(0, 0)]],
            "n01": [nn[(0, 1)]],
            "n10": [nn[(1, 0)]],
            "n11": [nn[(1, 1)]],
            "ctrl_pre": [mean[(0, 0)]],
            "ctrl_post": [mean[(0, 1)]],
            "treat_pre": [mean[(1, 0)]],
            "treat_post": [mean[(1, 1)]],
            "did": [
                (mean[(1, 1)] - mean[(1, 0)])
                - (mean[(0, 1)] - mean[(0, 0)])
            ],
        }
    )


@replay("q_ips_eval")
def r_ips_eval(t: Tables) -> pd.DataFrame:
    """IPS / SNIPS (Swaminathan & Joachims 2015) with empirical
    logging propensities pi_b(a) = c_a / N; target policy: even users
    -> 'click', odd -> 'purchase'."""
    e = t.events
    r_cents = _round_cents(e["value"])
    per: dict[str, list[int]] = {}
    for et, uid, rc in zip(e["event_type"], e["user_id"], r_cents):
        target = "click" if int(uid) % 2 == 0 else "purchase"
        row = per.setdefault(str(et), [0, 0, 0, 0])  # c, m, s, r_all
        row[0] += 1
        if str(et) == target:
            row[1] += 1
            row[2] += int(rc)
        row[3] += int(rc)
    ips = w = 0.0
    n = m = r = 0
    for a in sorted(per):  # engine folds in event_type order
        c_a, m_a, s_a, r_a = per[a]
        ips += s_a / (100.0 * c_a)
        w += m_a / c_a
        n += c_a
        m += m_a
        r += r_a
    return pd.DataFrame(
        {
            "n_events": [n],
            "n_matched": [m],
            "logged_mean": [r / (100.0 * n)],
            "ips_value": [ips],
            "snips_value": [ips / w],
        }
    )


@replay("q_sprt_ab")
def r_sprt_ab(t: Tables) -> pd.DataFrame:
    """Wald SPRT on the daily purchase share: cumulative Bernoulli LLR
    of H1 p=0.21 vs H0 p=0.19 against the Wald boundaries."""
    l1 = math.log(SPRT_P1 / SPRT_P0)
    l0 = math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))
    upper = math.log((1.0 - SPRT_BETA) / SPRT_ALPHA)
    lower = math.log(SPRT_BETA / (1.0 - SPRT_ALPHA))
    e = t.events
    days: dict = {}
    for ts, et in zip(e["ts"], e["event_type"]):
        d = pd.Timestamp(ts.date())  # Spark's DATE lands as Timestamp
        row = days.setdefault(d, [0, 0])
        row[0] += 1
        row[1] += int(et == "purchase")
    cum = 0.0
    rows = []
    for d in sorted(days):
        n, x = days[d]
        cum += float(x) * l1 + float(n - x) * l0
        dec = (
            "accept_h1"
            if cum >= upper
            else ("accept_h0" if cum <= lower else "continue")
        )
        rows.append((d, n, x, cum, dec))
    return pd.DataFrame(
        rows, columns=["d", "n_events", "n_purchases", "cum_llr", "decision"]
    )


@replay("q_regression_discontinuity")
def r_regression_discontinuity(t: Tables) -> pd.DataFrame:
    """Sharp RDD: local linear OLS on each side of the cents cutoff,
    effect = jump between fitted intercepts at the cutoff."""
    o = t.orders
    x = _trunc_cents(o["o_totalprice"]) - RDD_CUTOFF_C
    y = (o["o_orderpriority"].astype(str) <= "2-HIGH").to_numpy().astype(int)
    keep = (x >= -RDD_BW_C) & (x < RDD_BW_C)
    x, y = x[keep], y[keep]
    out = {}
    for side in (0, 1):
        sel = (x >= 0) == bool(side)
        xs, ys = x[sel], y[sel]
        n = int(sel.sum())
        sx = int(xs.sum())
        sy = int(ys.sum())
        sxx = int((xs.astype(object) * xs.astype(object)).sum())
        sxy = int((xs * ys).sum())
        slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
            float(n) * float(sxx) - float(sx) * float(sx)
        )
        out[side] = (n, (float(sy) - slope * float(sx)) / float(n))
    return pd.DataFrame(
        {
            "n_left": [out[0][0]],
            "n_right": [out[1][0]],
            "fit_left_at_cutoff": [out[0][1]],
            "fit_right_at_cutoff": [out[1][1]],
            "rdd_effect": [out[1][1] - out[0][1]],
        }
    )


@replay("q_covariate_balance")
def r_covariate_balance(t: Tables) -> pd.DataFrame:
    """Standardized mean differences (balance table): SMD =
    (m1-m0)/sqrt((v1+v0)/2) from exact integer moments, population
    variance."""
    c, o = t.customer, t.orders
    n_orders = o.groupby("o_custkey").size().to_dict()
    treat = (c["c_mktsegment"] == "BUILDING").to_numpy().astype(int)
    bal = _trunc_cents(c["c_acctbal"])
    cnt = np.array(
        [n_orders.get(int(k), 0) for k in c["c_custkey"]], dtype=np.int64
    )

    def moments(v, sel):
        vv = v[sel].astype(object)
        return int(sel.sum()), int(vv.sum()), int((vv * vv).sum())

    def smd(v):
        n1, s1, ss1 = moments(v, treat == 1)
        n0, s0, ss0 = moments(v, treat == 0)
        m1, m0 = s1 / n1, s0 / n0
        v1 = ss1 / n1 - m1 * m1
        v0 = ss0 / n0 - m0 * m0
        return (m1 - m0) / math.sqrt((v1 + v0) / 2.0)

    return pd.DataFrame(
        {
            "n_treat": [int((treat == 1).sum())],
            "n_ctrl": [int((treat == 0).sum())],
            "smd_acctbal": [smd(bal)],
            "smd_order_count": [smd(cnt)],
        }
    )


@replay("q_psi_drift")
def r_psi_drift(t: Tables) -> pd.DataFrame:
    """PSI with decile edges frozen on the pre-1998 era, +0.5
    smoothing: per-tile (p-q)*ln(p/q) terms."""
    o = t.orders
    cents = _dec_cents(o["o_totalprice"])
    keys = o["o_orderkey"].to_numpy(np.int64)
    pre = (o["o_orderdate"] < pd.Timestamp("1998-01-01")).to_numpy()
    base_c, base_k = cents[pre], keys[pre]
    cur_c = cents[~pre]
    order = np.lexsort((base_k, base_c))
    n1 = len(base_c)
    tiles = (np.arange(n1, dtype=np.int64) * 10) // n1
    sorted_c = base_c[order]
    edges = [int(sorted_c[tiles == tl].max()) for tl in range(9)]
    n_base = {tl: int((tiles == tl).sum()) for tl in range(10)}
    cur_tiles = np.sum(
        cur_c[:, None] > np.array(edges, dtype=np.int64)[None, :], axis=1
    )
    n2 = len(cur_c)
    n_cur: dict[int, int] = {}
    for tl in cur_tiles:
        n_cur[int(tl)] = n_cur.get(int(tl), 0) + 1
    rows = []
    for tl in sorted(set(n_base) | set(n_cur)):
        nb, nc = n_base.get(tl, 0), n_cur.get(tl, 0)
        ps = (nb + 0.5) / (n1 + 5.0)
        qs = (nc + 0.5) / (n2 + 5.0)
        rows.append((tl, nb, nc, (ps - qs) * math.log(ps / qs)))
    return pd.DataFrame(rows, columns=["tile", "n_base", "n_cur", "psi_term"])


@replay("q_cramers_v")
def r_cramers_v(t: Tables) -> pd.DataFrame:
    """Cramer's V: chi2 over the lang x source contingency table,
    V = sqrt(chi2 / (N * min(r-1, c-1)))."""
    d = t.documents
    cells: dict = {}
    for lg, src in zip(d["lang"], d["source"]):
        cells[(str(lg), str(src))] = cells.get((str(lg), str(src)), 0) + 1
    row_m: dict = {}
    col_m: dict = {}
    for (lg, src), o in cells.items():
        row_m[lg] = row_m.get(lg, 0) + o
        col_m[src] = col_m.get(src, 0) + o
    n = sum(cells.values())
    chi2 = 0.0
    for lg, src in sorted(cells):  # engine folds in (lang, source) order
        o = cells[(lg, src)]
        e = float(row_m[lg]) * float(col_m[src]) / float(n)
        chi2 += (float(o) - e) * (float(o) - e) / e
    r, c = len(row_m), len(col_m)
    return pd.DataFrame(
        {
            "n_docs": [n],
            "n_langs": [r],
            "n_sources": [c],
            "chi2": [chi2],
            "cramers_v": [math.sqrt(chi2 / (float(n) * min(r - 1, c - 1)))],
        }
    )


@replay("q_dd_quantiles")
def r_dd_quantiles(t: Tables) -> pd.DataFrame:
    """DD-style sketch (base-2 octaves, 16 linear sub-buckets) built
    from scratch; p50/p95/p99 by rank selection on bucket lower
    bounds — all integer arithmetic."""
    li = t.lineitem
    v = _trunc_cents(li["l_extendedprice"])
    flags = li["l_returnflag"].astype(str).to_numpy()
    sketches: dict[str, dict] = {}
    for g, vv in zip(flags, v):
        vv = int(vv)
        if vv < 1:
            continue
        e = vv.bit_length()
        p = 1 << (e - 1)
        s = ((vv - p) * DD_SUB) // p
        sk = sketches.setdefault(g, {})
        sk[(e, s)] = sk.get((e, s), 0) + 1
    rows = []
    for g in sorted(sketches):
        sk = sketches[g]
        n = sum(sk.values())
        cum = 0
        est = {}
        want = {
            "p50_cents": (n * 1 + 2 - 1) // 2,
            "p95_cents": (n * 19 + 20 - 1) // 20,
            "p99_cents": (n * 99 + 100 - 1) // 100,
        }
        for (e, s) in sorted(sk):
            cum += sk[(e, s)]
            p = 1 << (e - 1)
            lb = p + (s * p) // DD_SUB
            for name, rank in want.items():
                if name not in est and cum >= rank:
                    est[name] = lb
        rows.append(
            (
                g,
                n,
                len(sk),
                est["p50_cents"],
                est["p95_cents"],
                est["p99_cents"],
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "l_returnflag",
            "n_rows",
            "n_buckets",
            "p50_cents",
            "p95_cents",
            "p99_cents",
        ],
    )
    df["n_buckets"] = df["n_buckets"].astype(np.int32)
    return df


@replay("q_holt_smooth")
def r_holt_smooth(t: Tables) -> pd.DataFrame:
    """Holt double-exponential smoothing in exact quarter units:
    L_t = L+B + floor((X-(L+B))/4), B_t = B + floor((L_t-L-B)/4),
    L0 = X0, B0 = X1 - X0; one-step-ahead SAE rides the fold."""
    e = t.events
    counts: dict = {}
    for ts in e["ts"]:
        d = ts.date()
        counts[d] = counts.get(d, 0) + 1
    xs = [4 * counts[d] for d in sorted(counts)]
    n = len(xs)
    level, trend, sae = xs[0], xs[1] - xs[0], 0
    for x in xs[2:]:
        pred = level + trend
        delta = (x - pred) // 4  # floor division == floor(d/4.0)
        new_level = pred + delta
        trend = trend + delta // 4
        sae += abs(x - pred)
        level = new_level
    return pd.DataFrame(
        {
            "n_days": [n],
            "level_q": [level],
            "trend_q": [trend],
            "sae_q": [sae],
            "forecast_next_q": [level + trend],
        }
    )


@replay("q_group_quantiles")
def r_group_quantiles(t: Tables) -> pd.DataFrame:
    """Exact per-group order-statistic quantiles: rank by (price,
    orderkey), pick ranks ceil(n*q); a rank matching two labels keeps
    the FIRST label (p25 before p50 before p75)."""
    o = t.orders
    rows = []
    for prio, grp in o.groupby("o_orderpriority"):
        g = grp.sort_values(["o_totalprice", "o_orderkey"])
        n = len(g)
        prices = g["o_totalprice"].to_numpy()
        ranks = {
            "p25": math.ceil(n * 0.25),
            "p50": math.ceil(n * 0.5),
            "p75": math.ceil(n * 0.75),
        }
        got: dict[str, float] = {}
        for rn in sorted(set(ranks.values())):
            label = next(k for k in ("p25", "p50", "p75") if ranks[k] == rn)
            v = float(prices[rn - 1])
            got[label] = min(got.get(label, v), v)
        rows.append(
            (
                str(prio),
                got.get("p25", np.nan),
                got.get("p50", np.nan),
                got.get("p75", np.nan),
            )
        )
    return pd.DataFrame(rows, columns=["o_orderpriority", "p25", "p50", "p75"])


@replay("q_token_quantiles")
def r_token_quantiles(t: Tables) -> pd.DataFrame:
    """Per-language interpolated percentiles of whitespace token
    counts (numpy 'linear' == SQL percentile_cont)."""
    d = t.documents
    ntok = d["text"].map(lambda s: len(_ftoks(s)))
    rows = []
    for lg, grp in pd.DataFrame({"lang": d["lang"], "n": ntok}).groupby("lang"):
        v = grp["n"].to_numpy(np.float64)
        rows.append(
            (
                str(lg),
                len(v),
                float(np.percentile(v, 50, method="linear")),
                float(np.percentile(v, 90, method="linear")),
                float(np.percentile(v, 99, method="linear")),
                int(v.max()),
            )
        )
    return pd.DataFrame(
        rows, columns=["lang", "n_docs", "p50", "p90", "p99", "max_tokens"]
    )


@replay("q_unigram_bits")
def r_unigram_bits(t: Tables) -> pd.DataFrame:
    """Corpus-unigram cross-entropy per doc: mean -log2 p(token),
    p = corpus count / corpus total."""
    d = t.documents
    vocab: dict[str, int] = {}
    doc_toks = []
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = _ftoks(text)
        doc_toks.append((int(doc_id), toks))
        for tok in toks:
            vocab[tok] = vocab.get(tok, 0) + 1
    total = float(sum(vocab.values()))
    rows = []
    for doc_id, toks in doc_toks:
        if not toks:
            continue
        bits = [-math.log2(vocab[tok] / total) for tok in toks]
        rows.append((doc_id, len(toks), sum(bits) / len(bits)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "bits_per_token"])


def _doc_bigrams(t: Tables) -> tuple[list, dict, dict]:
    """Shared bigram machinery: per-doc ordered bigram lists over the
    filtered token array, corpus bigram counts c12 and prefix counts
    c1 (bigram instances starting with w1)."""
    d = t.documents
    docs = []
    c12: dict = {}
    c1: dict = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = _ftoks(text)
        pairs = list(zip(toks, toks[1:]))
        docs.append((int(doc_id), pairs))
        for pr in pairs:
            c12[pr] = c12.get(pr, 0) + 1
            c1[pr[0]] = c1.get(pr[0], 0) + 1
    return docs, c12, c1


@replay("q_bigram_perplexity")
def r_bigram_perplexity(t: Tables) -> pd.DataFrame:
    """Laplace-smoothed corpus bigram LM: p(w2|w1) = (c12+1)/(c1+V);
    per-doc cross-entropy = positional mean of -ln p, ppl = exp(H)."""
    docs, c12, c1 = _doc_bigrams(t)
    vocab = set()
    for text in t.documents["text"]:
        vocab.update(_ftoks(text))
    v = len(vocab)
    rows = []
    for doc_id, pairs in docs:
        if not pairs:
            continue
        snll = 0.0
        for w1, w2 in pairs:  # ordered positional fold
            snll += -math.log((c12[(w1, w2)] + 1) / float(c1[w1] + v))
        h = snll / len(pairs)
        rows.append((doc_id, len(pairs), h, math.exp(h)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bigrams", "cross_entropy", "ppl"]
    )


@replay("q_kneser_ney_bits")
def r_kneser_ney_bits(t: Tables) -> pd.DataFrame:
    """Interpolated Kneser-Ney bigram LM (D = 0.75): p(w2|w1) =
    max(c12-D,0)/c1 + (D*N1+(w1,.)/c1) * N1+(.,w2)/B."""
    docs, c12, c1 = _doc_bigrams(t)
    nf: dict = {}
    nb: dict = {}
    for w1, w2 in c12:
        nf[w1] = nf.get(w1, 0) + 1
        nb[w2] = nb.get(w2, 0) + 1
    b = float(len(c12))
    rows = []
    for doc_id, pairs in docs:
        if not pairs:
            continue
        snll = 0.0
        for w1, w2 in pairs:
            p = max(c12[(w1, w2)] - 0.75, 0.0) / c1[w1] + (
                0.75 * nf[w1] / c1[w1]
            ) * (nb[w2] / b)
            snll += -math.log(p)
        rows.append((doc_id, len(pairs), snll / len(pairs)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bigrams", "kn_cross_entropy"]
    )


@replay("q_rbo_rankings")
def r_rbo_rankings(t: Tables) -> pd.DataFrame:
    """Rank-biased overlap (Webber et al. 2010): per-depth overlap of
    the chars-vs-tokens top-k rankings, RBO_min partial sums."""
    d = t.documents
    ntok = d["text"].map(lambda s: len(_ftoks(s))).to_numpy(np.int64)
    nch = d["n_chars"].to_numpy(np.int64)
    ids = d["doc_id"].to_numpy(np.int64)
    rank_a = {
        int(ids[i]): r + 1
        for r, i in enumerate(np.lexsort((ids, -nch))[:RBO_K])
    }
    rank_b = {
        int(ids[i]): r + 1
        for r, i in enumerate(np.lexsort((ids, -ntok))[:RBO_K])
    }
    common = [
        (rank_a[k], rank_b[k]) for k in rank_a.keys() & rank_b.keys()
    ]
    rows = []
    acc = 0.0
    for depth in range(1, RBO_K + 1):
        n_common = sum(1 for ra, rb in common if ra <= depth and rb <= depth)
        acc += (RBO_P ** (depth - 1)) * n_common / depth
        rows.append((depth, n_common, (1.0 - RBO_P) * acc))
    return pd.DataFrame(rows, columns=["depth", "n_common", "rbo_partial"])


@replay("q_quantile_normalize")
def r_quantile_normalize(t: Tables) -> pd.DataFrame:
    """Quantile normalization (Bolstad et al. 2003): rank within
    source, replace with the exact cross-source mean at that rank
    (half-away decimal ratio)."""
    d = t.documents
    ranked = []
    for src, grp in d.groupby("source"):
        g = grp.sort_values(["n_chars", "doc_id"])
        for rk, (doc_id, nc) in enumerate(
            zip(g["doc_id"], g["n_chars"]), start=1
        ):
            ranked.append((int(doc_id), str(src), rk, int(nc)))
    sums: dict[int, list[int]] = {}
    for _, _, rk, nc in ranked:
        sc = sums.setdefault(rk, [0, 0])
        sc[0] += nc
        sc[1] += 1
    rows = [
        (doc_id, src, rk, nc, _half_away_ratio(sums[rk][0], sums[rk][1], 4))
        for doc_id, src, rk, nc in ranked
    ]
    return pd.DataFrame(
        rows, columns=["doc_id", "source", "rk", "n_chars", "norm_chars"]
    )


@replay("q_map_mrr_eval")
def r_map_mrr_eval(t: Tables) -> pd.DataFrame:
    """MAP@k / MRR: three tf-ranked runs scored against the binary
    >= 2 rel-term oracle; AP@k = sum rel_j (cum_rel_j / j) / min(R,k)."""
    d = t.documents
    base = []
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = _ftoks(text)
        tfs = {q: sum(1 for x in toks if x == q) for q in MAP_QUERIES}
        rel = int(sum(1 for x in toks if x == MAP_REL_TERM) >= 2)
        base.append((int(doc_id), tfs, rel))
    r_tot = sum(rel for _, _, rel in base)
    rows = []
    for q in MAP_QUERIES:
        ordered = sorted(base, key=lambda row: (-row[1][q], row[0]))[:MAP_K]
        cum_rel = 0
        ap_num = 0.0
        first_rel = None
        for j, (_, _, rel) in enumerate(ordered, start=1):
            cum_rel += rel
            ap_num += float(rel) * (float(cum_rel) / j)
            if rel and first_rel is None:
                first_rel = j
        rows.append(
            (
                q,
                r_tot,
                cum_rel,
                ap_num / float(min(r_tot, MAP_K)),
                (1.0 / first_rel) if first_rel else 0.0,
            )
        )
    return pd.DataFrame(
        rows, columns=["query_term", "n_relevant", "rel_at_k", "ap_at_k", "rr"]
    )


@replay("q_mutual_information")
def r_mutual_information(t: Tables) -> pd.DataFrame:
    """MI(token presence; planted >= 2 'join' label) from the four
    2x2 contingency cells per token, empty cells contributing zero;
    top-k by (rounded mi desc, token)."""
    d = t.documents
    n = len(d)
    ny = 0
    n1x: dict[str, int] = {}
    n11: dict[str, int] = {}
    for text in d["text"]:
        toks = _ftoks(text)
        y = int(sum(1 for x in toks if x == "join") >= 2)
        ny += y
        for tok in set(toks):
            n1x[tok] = n1x.get(tok, 0) + 1
            n11[tok] = n11.get(tok, 0) + y

    def term(nab, na, nb_):
        if nab <= 0:
            return 0.0
        p = float(nab)
        return (p / n) * math.log(p * float(n) / (float(na) * float(nb_)))

    rows = []
    for tok in n1x:
        a11 = n11[tok]
        a10 = n1x[tok] - a11
        a01 = ny - a11
        a00 = n - n1x[tok] - ny + a11
        mi = (
            term(a11, n1x[tok], ny)
            + term(a10, n1x[tok], n - ny)
            + term(a01, n - n1x[tok], ny)
            + term(a00, n - n1x[tok], n - ny)
        )
        mi_r = math.floor(mi * 1e6 + 0.5) / 1e6  # engine's stable_round
        rows.append((tok, n1x[tok], a11, mi_r))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return pd.DataFrame(
        rows[:MI_TOPK], columns=["t", "n_docs_with", "n_pos_with", "mi"]
    )


@replay("q_chi2_terms")
def r_chi2_terms(t: Tables) -> pd.DataFrame:
    """Chi-square feature selection per language over doc-distinct
    token presence, df >= 5 prefilter; chi2 as the exact half-away
    4-decimal integer ratio, top 10 per language by (chi2, token)."""
    d = t.documents
    n = len(d)
    n_l: dict[str, int] = {}
    df_t: dict[str, int] = {}
    a_lt: dict = {}
    for lg, text in zip(d["lang"], d["text"]):
        lg = str(lg)
        n_l[lg] = n_l.get(lg, 0) + 1
        for tok in set(_ftoks(text)):
            df_t[tok] = df_t.get(tok, 0) + 1
            a_lt[(lg, tok)] = a_lt.get((lg, tok), 0) + 1
    scored: dict[str, list] = {}
    for (lg, tok), a in a_lt.items():
        df = df_t[tok]
        if df < 5:
            continue
        b = df - a
        c = n_l[lg] - a
        dd = n - df - c
        num = n * (a * dd - b * c) ** 2
        den = df * (n - df) * n_l[lg] * (n - n_l[lg])
        q = (2 * num * 10**4 + den) // (2 * den)  # exact, num >= 0
        scored.setdefault(lg, []).append((tok, a, df, q))
    rows = []
    for lg in scored:
        ranked = sorted(scored[lg], key=lambda r: (-r[3], r[0]))[:10]
        for rn, (tok, a, df, q) in enumerate(ranked, start=1):
            rows.append((lg, tok, a, df, q / 1e4, rn))
    return pd.DataFrame(
        rows, columns=["lang", "tok", "a", "df", "chi2", "rn"]
    )


@replay("q_cohen_kappa")
def r_cohen_kappa(t: Tables) -> pd.DataFrame:
    """Cohen's kappa between declared and guessed language: po =
    diag/N, pe = sum row_c col_c / N^2, kappa = (po-pe)/(1-pe). The
    guesser is re-derived (stopword-hit argmax, ties to first sorted
    code, 'und' on zero hits) — not imported from the engine."""
    d = t.documents
    cells: dict = {}
    for lang, text in zip(d["lang"], d["text"]):
        toks = text.split(" ")  # raw split, engine parity
        hits = {
            lg: sum(1 for tok in toks if tok in mk)
            for lg, mk in LANG_MARKERS.items()
        }
        best = max(hits.values())
        guess = "und"
        if best > 0:
            guess = min(lg for lg, h in hits.items() if h == best)
        cells[(str(lang), guess)] = cells.get((str(lang), guess), 0) + 1
    n_docs = sum(cells.values())
    n_agree = sum(v for (a, b), v in cells.items() if a == b)
    rows_m: dict = {}
    cols_m: dict = {}
    for (a, b), v in cells.items():
        rows_m[a] = rows_m.get(a, 0) + v
        cols_m[b] = cols_m.get(b, 0) + v
    pe_num = sum(
        rows_m.get(cls, 0) * cols_m.get(cls, 0)
        for cls in set(rows_m) | set(cols_m)
    )
    po = n_agree / n_docs
    pe = pe_num / (n_docs * n_docs)
    kappa = 0.0 if pe == 1.0 else (po - pe) / (1.0 - pe)
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_agree": [n_agree],
            "po": [po],
            "pe": [pe],
            "kappa": [kappa],
        }
    )


# ---------------------------------------------------------------------------
# round-12 wave: bit-exact codec golden vectors (VERDICT r11 item 2)
#
# The codec queries' oracle replays the PIXEL closed form, and the
# decoder tests run against the repo's own encoders — so a bug shared
# by encoder and decoder (a mirrored stride error, a wrong-but-
# symmetric filter, an LZW width-off-by-one on both sides) survives
# both gates. Each golden below is a payload CONSTRUCTED HERE from the
# format's published spec (entropy bitstreams hand-derived in the
# comments, never produced by the engine's encoder) paired with the
# hand-computed decode. tools/replay_check.py feeds the payload to the
# PRODUCTION decoder and compares. GOLDENS: kind -> list of
# {payload, expect}; expect keys are a subset of the decoder's output.
# ---------------------------------------------------------------------------


def _bmp_golden(w: int, h: int, rows_rgb: list[list[tuple]]) -> bytes:
    """Spec-layout 24-bit bottom-up BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, BGR byte order, rows padded to 4-byte stride,
    file rows bottom-up (file row 0 = image row h-1)."""
    import struct

    stride = ((3 * w + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for r, g, b in rows_rgb[y]:
            line += bytes((b, g, r))  # BGR on disk
        line += bytes(stride - len(line))  # pad
        body += line
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def _png_golden(w: int, h: int, scanlines: list[bytes]) -> tuple[bytes, int]:
    """Spec-layout 8-bit RGB PNG from HAND-FILTERED scanlines (each =
    filter byte + filtered bytes, filtering worked out in the vector
    comments, not by an encoder). Returns (blob, n_idat)."""
    import struct
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    comp = zlib.compress(b"".join(scanlines), 9)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    n_idat = 0
    for off in range(0, len(comp), 5):  # 5-byte chunks: multi-IDAT path
        blob += chunk(b"IDAT", comp[off : off + 5])
        n_idat += 1
    return blob + chunk(b"IEND", b""), n_idat


def _gif_golden(w: int, h: int, lzw_bytes: bytes) -> bytes:
    """Spec-layout GIF89a: 4-entry global color table (packed size
    bits = 1), full-frame image descriptor, min LZW code size 2, the
    HAND-PACKED LZW bitstream in one sub-block."""
    import struct

    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", w, h, 0b10100001, 0, 0)  # GCT, 4 entries
    for rgb in _GIF_GOLD_PALETTE:
        blob += bytes(rgb)
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    blob += bytes([2])  # LZW min code size
    blob += bytes([len(lzw_bytes)]) + lzw_bytes + b"\x00\x3b"
    return bytes(blob)


_GIF_GOLD_PALETTE = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]


def _jpeg_golden(w: int, h: int, scan: bytes) -> bytes:
    """Spec-layout baseline grayscale JFIF with DECLARED simple
    Huffman tables (DC: eight 3-bit codes for categories 0-7, so
    cat k = binary k; AC: the single 1-bit code 0 for EOB) and a
    DC-exact quant table (Q[0]=8, rest 16). The entropy bytes are
    hand-derived per vector."""
    qt = bytes([8] + [16] * 63)  # zigzag order; index 0 is DC
    b = bytearray(b"\xff\xd8")
    b += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + qt
    bits_dc = bytes(8 if i == 2 else 0 for i in range(16))  # 8 codes, len 3
    b += (
        b"\xff\xc4"
        + (2 + 1 + 16 + 8).to_bytes(2, "big")
        + b"\x00"
        + bits_dc
        + bytes(range(8))
    )
    bits_ac = bytes(1 if i == 0 else 0 for i in range(16))  # 1 code, len 1
    b += (
        b"\xff\xc4"
        + (2 + 1 + 16 + 1).to_bytes(2, "big")
        + b"\x10"
        + bits_ac
        + b"\x00"
    )
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    b += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    b += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    b += scan
    b += b"\xff\xd9"
    return bytes(b)


def _avi_golden(w: int, h: int, jpeg_frames: list[bytes]) -> bytes:
    """Spec-layout RIFF/AVI (even-padding rules) wrapping hand-built
    MJPG frames, with avih/strh headers and an idx1 index."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    nf = len(jpeg_frames)
    avih = struct.pack(
        "<14I", 40_000, 0, 0, 0x10, nf, 0, 1,
        max(len(fr) for fr in jpeg_frames), w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + bytes(48)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi_payload = b"movi"
    idx = b""
    for fr in jpeg_frames:
        idx += b"00dc" + struct.pack(
            "<III", 0x10, len(movi_payload) - 4, len(fr)
        )
        movi_payload += chunk(b"00dc", fr)
    body = (
        b"AVI " + hdrl + chunk(b"LIST", movi_payload) + chunk(b"idx1", idx)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_golden(body_len: int) -> bytes:
    """16-byte RIFF/WAVE preamble + body (the media_with_headers WAV
    row layout, rebuilt from the RIFF spec)."""
    body = bytes((i * 7 + 3) % 256 for i in range(body_len))
    return b"RIFF" + (36 + body_len).to_bytes(4, "little") + b"WAVEfmt " + body


def build_goldens() -> dict[str, list[dict]]:
    g: dict[str, list[dict]] = {}

    # -- BMP: 2x2 primary colors (row order + BGR swap detector), and
    # 3x1 (nonzero stride padding). Means are hand-computed.
    g["bmp"] = [
        {
            "payload": _bmp_golden(
                2, 2,
                [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]],
            ),
            "expect": {
                "width": 2, "height": 2,
                "tl_r": 255, "tl_g": 0, "tl_b": 0,
                "br_r": 255, "br_g": 255, "br_b": 255,
                "mean_r": 127.5, "mean_g": 127.5, "mean_b": 127.5,
            },
        },
        {
            "payload": _bmp_golden(
                3, 1, [[(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
            ),
            "expect": {
                "width": 3, "height": 1,
                "tl_r": 10, "tl_g": 20, "tl_b": 30,
                "br_r": 70, "br_g": 80, "br_b": 90,
                "mean_r": 40.0, "mean_g": 50.0, "mean_b": 60.0,
            },
        },
    ]

    # -- PNG vector 1: 2x2, filters None + Up.
    # pixels row0 (1,2,3),(4,5,6); row1 (7,8,9),(10,11,12).
    # Up-filtered row1 bytes: v - up = 6,6,6,6,6,6.
    png1, n1 = _png_golden(
        2, 2,
        [bytes([0, 1, 2, 3, 4, 5, 6]), bytes([2, 6, 6, 6, 6, 6, 6])],
    )
    # -- PNG vector 2: 1x4, filters None/Sub/Average/Paeth.
    # actual rows: (10,20,30),(11,21,31),(15,25,35),(20,30,40).
    # Sub row (left=0): stored = actual. Average row: pred =
    # (0+up)//2 = (5,10,15) -> stored (10,15,20). Paeth row: a=c=0,
    # b=up -> predictor = up = (15,25,35) -> stored (5,5,5).
    png2, n2 = _png_golden(
        1, 4,
        [
            bytes([0, 10, 20, 30]),
            bytes([1, 11, 21, 31]),
            bytes([3, 10, 15, 20]),
            bytes([4, 5, 5, 5]),
        ],
    )
    g["png"] = [
        {
            "payload": png1,
            "expect": {
                "width": 2, "height": 2,
                "tl_r": 1, "tl_g": 2, "tl_b": 3,
                "br_r": 10, "br_g": 11, "br_b": 12,
                "mean_r": 5.5, "mean_g": 6.5, "mean_b": 7.5,
                "n_idat": n1, "n_filters": 2,
            },
        },
        {
            "payload": png2,
            "expect": {
                "width": 1, "height": 4,
                "tl_r": 10, "tl_g": 20, "tl_b": 30,
                "br_r": 20, "br_g": 30, "br_b": 40,
                "mean_r": 14.0, "mean_g": 24.0, "mean_b": 34.0,
                "n_idat": n2, "n_filters": 4,
            },
        },
    ]

    # -- GIF vector 1: 2x2, indices [0,1,2,3] — exercises the code-
    # width bump. min code 2: clear=4, eoi=5, start width 3. Encoder
    # emits 4,0,1,2 at 3 bits, adds entries 6,7,8 (8 = 2^3 -> bump),
    # then 3,5 at 4 bits. LSB-first packing:
    # 4<<0 | 0<<3 | 1<<6 | 2<<9 | 3<<12 | 5<<16 = 341060 = 0x053444
    # -> bytes 44 34 05.
    # -- GIF vector 2: 3x1, indices [1,1,1] — exercises the KwKwK
    # special case (decoder receives code 6 == next free entry).
    # Codes 4,1,6,5 all at 3 bits: 4 | 1<<3 | 6<<6 | 5<<9 = 2956 =
    # 0x0B8C -> bytes 8C 0B.
    pal = _GIF_GOLD_PALETTE
    g["gif"] = [
        {
            "payload": _gif_golden(2, 2, bytes([0x44, 0x34, 0x05])),
            "expect": {
                "width": 2, "height": 2,
                "pixels": [pal[0], pal[1], pal[2], pal[3]],
                "tl_r": pal[0][0], "tl_g": pal[0][1], "tl_b": pal[0][2],
                "br_r": pal[3][0], "br_g": pal[3][1], "br_b": pal[3][2],
                "mean_r": 80.0, "mean_g": 90.0, "mean_b": 100.0,
            },
        },
        {
            "payload": _gif_golden(3, 1, bytes([0x8C, 0x0B])),
            "expect": {
                "width": 3, "height": 1,
                "pixels": [pal[1], pal[1], pal[1]],
                "mean_r": 40.0, "mean_g": 50.0, "mean_b": 60.0,
            },
        },
    ]

    # -- JPEG vector 1: 8x8 flat gray 200. Quantized DC = 8*(200-128)
    # / Q[0]=8 = 72, category 7 (code 111), raw bits 1001000, EOB 0,
    # pad 11111 -> bytes F2 1F.
    # -- JPEG vector 2: 16x8, two blocks 100 then 50 — exercises DC
    # prediction. qDC1 = -28: diff -28, cat 5 (code 101), raw =
    # -28 + 31 = 3 -> 00011. qDC2 = -78: diff -50, cat 6 (code 110),
    # raw = -50 + 63 = 13 -> 001101. Bits:
    # 101 00011 0 110 001101 0 + 11111 -> bytes A3 63 5F.
    g["jpeg"] = [
        {
            "payload": _jpeg_golden(8, 8, bytes([0xF2, 0x1F])),
            "expect": {
                "width": 8, "height": 8, "n_comps": 1,
                "pixels": [200] * 64,
            },
        },
        {
            "payload": _jpeg_golden(16, 8, bytes([0xA3, 0x63, 0x5F])),
            "expect": {
                "width": 16, "height": 8, "n_comps": 1,
                "pixels": ([100] * 8 + [50] * 8) * 8,
            },
        },
    ]

    # -- AVI: one-frame MJPG container around JPEG vector 1, plus a
    # two-frame container (vectors 1 then 1 again) proving the chunk
    # walk + idx1 count.
    j1 = g["jpeg"][0]["payload"]
    g["avi"] = [
        {
            "payload": _avi_golden(8, 8, [j1]),
            "expect": {
                "width": 8, "height": 8, "n_frames": 1, "n_idx": 1,
                "frames": [[200] * 64],
            },
        },
        {
            "payload": _avi_golden(8, 8, [j1, j1]),
            "expect": {
                "width": 8, "height": 8, "n_frames": 2, "n_idx": 2,
                "frames": [[200] * 64, [200] * 64],
            },
        },
    ]

    # -- Audio windowing: RIFF preamble 16 bytes, window = 2 ms x
    # 32 B/ms = 64 B. body 150 -> windows (0,64,0ms),(64,64,2ms),
    # (128,22,4ms); body 64 -> exactly one full window.
    g["audio_windows"] = [
        {
            "payload": _wav_golden(150),
            "expect": {
                "windows": [(0, 0, 64, 0), (1, 64, 64, 2), (2, 128, 22, 4)]
            },
        },
        {
            "payload": _wav_golden(64),
            "expect": {"windows": [(0, 0, 64, 0)]},
        },
    ]
    return g


GOLDENS = build_goldens()


# ---------------------------------------------------------------------------
# round-12 wave 2: time-series / causal-adjacent / mining family
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2  # queries/analytics.py EWMA_ALPHA
CONF_ALPHA_NUM = 9  # queries/analytics.py CONF_ALPHA_NUM
CONF_ALPHA_DEN = 10  # queries/analytics.py CONF_ALPHA_DEN
ISO_BINS = 16  # queries/analytics.py ISO_BINS
ISO_CENTS_PER_BIN = 40_000_00  # queries/analytics.py ISO_CENTS_PER_BIN
SEQ_MINSUP_PCT = 5  # queries/analytics.py SEQ_MINSUP_PCT
POWER_MDE_PCT = 5  # queries/analytics.py POWER_MDE_PCT
POWER_Z_ALPHA = 1.959963985  # queries/analytics.py POWER_Z_ALPHA
POWER_Z_BETA = 0.841621234  # queries/analytics.py POWER_Z_BETA


def _hourly_counts(t: Tables) -> dict:
    """(event_type, hour_ts) -> count over the events stream."""
    out: dict = {}
    for et, ts in zip(t.events["event_type"], t.events["ts"]):
        key = (str(et), ts.floor("h"))
        out[key] = out.get(key, 0) + 1
    return out


def _daily_counts_by_type(t: Tables) -> dict:
    out: dict = {}
    for et, ts in zip(t.events["event_type"], t.events["ts"]):
        key = (str(et), pd.Timestamp(ts.date()))
        out[key] = out.get(key, 0) + 1
    return out


@replay("q_histogram_equidepth")
def r_histogram_equidepth(t: Tables) -> pd.DataFrame:
    """Exact equi-depth histogram: bucket = 0-based rank * 10 // N
    (ties broken by orderkey), per-bucket count / min / max."""
    o = t.orders
    v = _money(o["o_totalprice"])
    keys = o["o_orderkey"].to_numpy(np.int64)
    order = np.lexsort((keys, v))
    n = len(v)
    buckets: dict[int, list] = {}
    for gid, idx in enumerate(order):
        b = (gid * 10) // n + 1
        val = float(v[idx])
        row = buckets.setdefault(b, [0, val, val])
        row[0] += 1
        row[1] = min(row[1], val)
        row[2] = max(row[2], val)
    return pd.DataFrame(
        [(b, c, lo, hi) for b, (c, lo, hi) in sorted(buckets.items())],
        columns=["bucket", "n", "lo", "hi"],
    )


@replay("q_timeseries_decompose")
def r_timeseries_decompose(t: Tables) -> pd.DataFrame:
    """Seasonal-naive decomposition: hour-of-day mean per type as the
    seasonal component, residual = n - seasonal."""
    hourly = _hourly_counts(t)
    groups: dict = {}
    for (et, hts), n in hourly.items():
        groups.setdefault((et, hts.hour), []).append(n)
    rows = []
    for (et, hts), n in hourly.items():
        vals = groups[(et, hts.hour)]
        seas = sum(vals) / len(vals)
        rows.append((et, hts, n, seas, n - seas))
    return pd.DataFrame(
        rows, columns=["event_type", "hour_ts", "n", "seasonal", "residual"]
    )


@replay("q_ewma_smooth")
def r_ewma_smooth(t: Tables) -> pd.DataFrame:
    """EWMA by the TEXTBOOK recursion e_1 = x_1,
    e_i = a x_i + (1-a) e_{i-1} — the engine evaluates the closed-form
    weight sum instead, so agreement proves the expansion."""
    hourly = _hourly_counts(t)
    series: dict = {}
    for (et, hts), n in sorted(hourly.items(), key=lambda kv: kv[0]):
        series.setdefault(et, []).append((hts, n))
    rows = []
    for et, pts in series.items():
        e = None
        for hts, x in pts:
            e = x if e is None else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * e
            rows.append((et, hts, x, e, abs(x - e)))
    return pd.DataFrame(
        rows, columns=["event_type", "hour_ts", "n", "ewma", "deviation"]
    )


@replay("q_linear_fit")
def r_linear_fit(t: Tables) -> pd.DataFrame:
    """Per-segment OLS from exact integer cents moments (arbitrary-
    precision Python ints), closed form in float64."""
    li = t.lineitem
    segs: dict[str, list] = {}
    qx = np.rint(_money(li["l_quantity"]) * 100).astype(np.int64)
    px = np.rint(_money(li["l_extendedprice"]) * 100).astype(np.int64)
    for seg, x, y in zip(li["l_returnflag"], qx, px):
        segs.setdefault(str(seg), []).append((int(x), int(y)))
    rows = []
    for seg, pts in sorted(segs.items()):
        n = float(len(pts))
        sx = float(sum(x for x, _ in pts))
        sy = float(sum(y for _, y in pts))
        sxx = float(sum(x * x for x, _ in pts))
        sxy = float(sum(x * y for x, y in pts))
        syy = float(sum(y * y for _, y in pts))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        rows.append((seg, int(n), slope, intercept, r * r))
    return pd.DataFrame(
        rows, columns=["seg", "n_rows", "slope", "intercept", "r2"]
    )


@replay("q_seasonal_index")
def r_seasonal_index(t: Tables) -> pd.DataFrame:
    """Hour-of-day seasonal index: (sum_h * N) / (n_h * S) from exact
    floor-cents integers."""
    e = t.events
    # value is DECIMAL(12,2) at the engine's scan (catalog.MONEY_COLS),
    # so floor(value * 100) is the EXACT cents — rint, not float-floor
    cents = np.rint(_money(e["value"]) * 100.0).astype(np.int64)
    byh: dict[int, list] = {}
    for ts, c in zip(e["ts"], cents):
        row = byh.setdefault(ts.hour, [0, 0])
        row[0] += 1
        row[1] += int(c)
    tot_n = sum(v[0] for v in byh.values())
    tot_s = sum(v[1] for v in byh.values())
    rows = [
        (hr, n, s, (s * tot_n) / (n * tot_s))
        for hr, (n, s) in sorted(byh.items())
    ]
    return pd.DataFrame(
        rows, columns=["hr", "n_events", "sum_cents", "index_x"]
    )


@replay("q_cusum_changepoints")
def r_cusum_changepoints(t: Tables) -> pd.DataFrame:
    """One-sided CUSUM by the TEXTBOOK recursion S_t = max(0,
    S_{t-1} + z_t) in scaled integers — the engine evaluates the
    prefix-sum/running-min closed form instead."""
    daily = _daily_counts_by_type(t)
    series: dict = {}
    for (et, d), x in sorted(daily.items(), key=lambda kv: kv[0]):
        series.setdefault(et, []).append((d, x))
    rows = []
    for et, pts in series.items():
        n_days = len(pts)
        total = sum(x for _, x in pts)
        s = 0
        for d, x in pts:
            s = max(0, s + (n_days * x - total))
            rows.append((et, d, x, s, int(s > total)))
    return pd.DataFrame(
        rows, columns=["event_type", "d", "x", "s", "is_change"]
    )


@replay("q_association_rules")
def r_association_rules(t: Tables) -> pd.DataFrame:
    """A-priori pair rules over order baskets: support >= 3 pairs of
    items each in >= 20 baskets; confidence/lift as exact half-away
    4-decimal ratios."""
    li = t.lineitem
    baskets: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(o), set()).add(int(p))
    item: dict[int, int] = {}
    for items in baskets.values():
        for p in items:
            item[p] = item.get(p, 0) + 1
    frequent = {p for p, c in item.items() if c >= 20}
    pair: dict = {}
    for items in baskets.values():
        fi = sorted(i for i in items if i in frequent)
        for i in range(len(fi)):
            for j in range(i + 1, len(fi)):
                pair[(fi[i], fi[j])] = pair.get((fi[i], fi[j]), 0) + 1
    nb = len(baskets)
    rows = []
    for (pa, pb), np_ in sorted(pair.items()):
        if np_ < 3:
            continue
        na, nbb = item[pa], item[pb]
        rows.append(
            (
                pa, pb, np_, na, nbb,
                _half_away_ratio(np_, na, 4),
                _half_away_ratio(np_, nbb, 4),
                _half_away_ratio(np_ * nb, na * nbb, 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "p_a", "p_b", "n_pair", "n_a", "n_b",
            "conf_ab", "conf_ba", "lift",
        ],
    )


@replay("q_rolling_median")
def r_rolling_median(t: Tables) -> pd.DataFrame:
    """Trailing-7-row lower median of daily counts per type: element
    floor((n-1)/2) of the sorted window — pure order statistics."""
    daily = _daily_counts_by_type(t)
    series: dict = {}
    for (et, d), x in sorted(daily.items(), key=lambda kv: kv[0]):
        series.setdefault(et, []).append((d, x))
    rows = []
    for et, pts in series.items():
        for i, (d, x) in enumerate(pts):
            win = sorted(v for _, v in pts[max(0, i - 6) : i + 1])
            rows.append((et, d, x, win[(len(win) - 1) // 2]))
    return pd.DataFrame(
        rows, columns=["event_type", "d", "n_events", "rolling_median7"]
    )


@replay("q_conformal_interval")
def r_conformal_interval(t: Tables) -> pd.DataFrame:
    """Split-conformal interval: group-mean model on even keys, q-hat
    = ceil(0.9 (n+1))-th smallest calibration residual, coverage on
    odd keys."""
    from decimal import Decimal

    o = t.orders
    is_cal = (o["o_orderkey"].to_numpy(np.int64) % 2) == 0
    prio = o["o_orderpriority"].astype(str).to_numpy()
    cents = np.rint(_money(o["o_totalprice"]) * 100).astype(np.int64)
    sums: dict[str, list] = {}
    for p, c, ic in zip(prio, cents, is_cal):
        if ic:
            row = sums.setdefault(p, [0, 0])
            row[0] += int(c)
            row[1] += 1
    yhat = {
        p: float(Decimal(s).scaleb(-2)) / n for p, (s, n) in sums.items()
    }
    r_cal, r_test = [], []
    for p, c, ic in zip(prio, cents, is_cal):
        r = abs(float(Decimal(int(c)).scaleb(-2)) - yhat[p])
        (r_cal if ic else r_test).append(r)
    r_cal.sort()
    n_cal = len(r_cal)
    rank = min(n_cal, -(-(CONF_ALPHA_NUM * (n_cal + 1)) // CONF_ALPHA_DEN))
    qhat = r_cal[rank - 1]
    n_in = sum(1 for r in r_test if r <= qhat)
    return pd.DataFrame(
        {
            "n_cal": [n_cal],
            "n_test": [len(r_test)],
            "qhat": [qhat],
            "coverage": [n_in / len(r_test)],
        }
    )


@replay("q_mase_forecast_eval")
def r_mase_forecast_eval(t: Tables) -> pd.DataFrame:
    """MASE: seasonal-naive (lag 7) vs naive (lag 1) absolute errors
    over calendar-matched day pairs, exact integer sums."""
    counts: dict = {}
    for ts in t.events["ts"]:
        d = ts.date()
        counts[d] = counts.get(d, 0) + 1

    def err(k: int):
        import datetime

        n = ae = 0
        for d, x in counts.items():
            prev = d - datetime.timedelta(days=k)
            if prev in counts:
                n += 1
                ae += abs(x - counts[prev])
        return n, ae

    ns, aes = err(7)
    nn, aen = err(1)
    mae_s, mae_n = aes / ns, aen / nn
    return pd.DataFrame(
        {
            "n_seasonal": [ns],
            "n_naive": [nn],
            "mae_seasonal": [mae_s],
            "mae_naive": [mae_n],
            "mase": [0.0 if mae_n == 0.0 else mae_s / mae_n],
        }
    )


@replay("q_isotonic_calibration")
def r_isotonic_calibration(t: Tables) -> pd.DataFrame:
    """Isotonic fit by the SEQUENTIAL pool-adjacent-violators
    algorithm (stack form) — a genuinely different algorithm from the
    engine's minimax closed form; equality proves the fit."""
    o = t.orders
    cents = _trunc_cents(o["o_totalprice"])
    bins: dict[int, list] = {}
    for c, st in zip(cents, o["o_orderstatus"]):
        b = min(ISO_BINS - 1, int(c) // ISO_CENTS_PER_BIN)
        row = bins.setdefault(b, [0, 0])
        row[0] += 1
        row[1] += int(str(st) == "F")
    ordered = sorted(bins.items())
    # PAVA: blocks of (sum_k, sum_n, members); merge while decreasing
    stack: list[list] = []
    for b, (n, k) in ordered:
        stack.append([k, n, [b]])
        while len(stack) >= 2 and (
            stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]
        ):
            k2, n2, m2 = stack.pop()
            stack[-1][0] += k2
            stack[-1][1] += n2
            stack[-1][2].extend(m2)
    rate = {}
    for k, n, members in stack:
        for b in members:
            rate[b] = k / n
    return pd.DataFrame(
        [(b, n, k, rate[b]) for b, (n, k) in ordered],
        columns=["bin", "n_orders", "n_pos", "iso_rate"],
    )


@replay("q_sequence_mining")
def r_sequence_mining(t: Tables) -> pd.DataFrame:
    """GSP-style frequent subsequences by the TEXTBOOK subsequence
    test: per user ordered type sequence, brute-force existence scan
    per candidate pattern — the engine's min/max-position compression
    must agree."""
    e = t.events.sort_values(["user_id", "ts", "event_id"])
    seqs: dict[int, list[str]] = {}
    for u, et in zip(e["user_id"], e["event_type"]):
        seqs.setdefault(int(u), []).append(str(et))
    types = sorted({et for s in seqs.values() for et in s})
    n_users = len(seqs)
    minsup = max(1, (n_users * SEQ_MINSUP_PCT) // 100)

    def is_subseq(pat: tuple, seq: list[str]) -> bool:
        i = 0
        for x in seq:
            if x == pat[i]:
                i += 1
                if i == len(pat):
                    return True
        return False

    rows = []
    for length in (2, 3):
        import itertools

        for pat in itertools.product(types, repeat=length):
            sup = sum(1 for s in seqs.values() if is_subseq(pat, s))
            if sup >= minsup:
                rows.append((">".join(pat), length, sup))
    return pd.DataFrame(rows, columns=["pattern", "length", "support"])


@replay("q_power_analysis")
def r_power_analysis(t: Tables) -> pd.DataFrame:
    """A/B sample size n = 2 sigma^2 (z_a + z_b)^2 / delta^2 from
    exact cents moments; days_needed at the observed event rate."""
    e = t.events
    c = _round_cents(e["value"])
    n = len(c)
    s = int(c.astype(object).sum())
    ss = int((c.astype(object) * c.astype(object)).sum())
    users = e["user_id"].nunique()
    days = e["ts"].map(lambda x: x.date()).nunique()
    mean = s / n
    var = ss / n - mean * mean
    delta = mean * (POWER_MDE_PCT / 100.0)
    z = POWER_Z_ALPHA + POWER_Z_BETA
    n_arm = math.ceil(2.0 * var * z * z / (delta * delta))
    return pd.DataFrame(
        {
            "n_events": [n],
            "metric_mean": [mean / 100.0],
            "metric_sd": [math.sqrt(var) / 100.0],
            "n_per_arm": [n_arm],
            "days_needed": [math.ceil(2.0 * n_arm / (n / days))],
        }
    )


@replay("q_srm_check")
def r_srm_check(t: Tables) -> pd.DataFrame:
    """Sample-ratio-mismatch chi-square on the portable 60-bit md5
    50/50 user split."""
    users = {str(int(u)) for u in t.events["user_id"]}
    n0 = sum(1 for u in users if _portable_hash(u, salt="srm") % 2 == 0)
    n1 = len(users) - n0
    ex = (n0 + n1) / 2.0
    chi = (n0 - ex) ** 2 / ex + (n1 - ex) ** 2 / ex
    return pd.DataFrame(
        {
            "n_arm0": [n0],
            "n_arm1": [n1],
            "chi2": [chi],
            "srm_flag": [int(chi > 3.841)],
        }
    )


@replay("q_item_cooccurrence")
def r_item_cooccurrence(t: Tables) -> pd.DataFrame:
    """Item-item co-occurrence: distinct (user, type) pairs, cosine =
    c_ab / sqrt(c_a c_b), lift = c_ab N / (c_a c_b)."""
    e = t.events
    ui = {(int(u), str(et)) for u, et in zip(e["user_id"], e["event_type"])}
    n_users = len({u for u, _ in ui})
    c_item: dict[str, int] = {}
    by_user: dict[int, list] = {}
    for u, it in ui:
        c_item[it] = c_item.get(it, 0) + 1
        by_user.setdefault(u, []).append(it)
    pair: dict = {}
    for items in by_user.values():
        items = sorted(items)
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                pair[(items[i], items[j])] = pair.get(
                    (items[i], items[j]), 0
                ) + 1
    rows = []
    for (a, b), cab in sorted(pair.items()):
        ca, cb = c_item[a], c_item[b]
        rows.append(
            (
                a, b, ca, cb, cab,
                cab / math.sqrt(float(ca * cb)),
                float(cab * n_users) / float(ca * cb),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["item_a", "item_b", "n_a", "n_b", "n_ab", "cosine", "lift"],
    )


@replay("q_event_transitions")
def r_event_transitions(t: Tables) -> pd.DataFrame:
    """First-order Markov transition counts over per-user (ts,
    event_id)-ordered streams; share scaled x10000."""
    e = t.events.sort_values(["user_id", "ts", "event_id"])
    counts: dict = {}
    prev_u = prev_t = None
    for u, et in zip(e["user_id"], e["event_type"]):
        if prev_u == u:
            counts[(prev_t, str(et))] = counts.get((prev_t, str(et)), 0) + 1
        prev_u, prev_t = u, str(et)
    totals: dict = {}
    for (src, _), n in counts.items():
        totals[src] = totals.get(src, 0) + n
    rows = [
        (src, dst, n, n * 10000 / totals[src])
        for (src, dst), n in sorted(counts.items())
    ]
    return pd.DataFrame(rows, columns=["src", "dst", "n_trans", "p_x10000"])


# ---------------------------------------------------------------------------
# round-12 wave 3: graph family over the near-dup pair graph
# ---------------------------------------------------------------------------

PPR_SEED_MOD = 10  # queries/dedup.py PPR_SEED_MOD
PPR_ITER = 4  # queries/dedup.py PPR_ITER
PPR_D = 0.85  # queries/dedup.py PPR_D


def _dup_graph(t: Tables):
    """Undirected near-dup graph from the independent MinHash pair
    replay: (ordered pair list, directed both-orientation edge list,
    degree map)."""
    pairs = [(a, b) for a, b, _ in _minhash_pairs_replay(t)]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    return pairs, edges, deg


@replay("q_dup_triangles")
def r_dup_triangles(t: Tables) -> pd.DataFrame:
    """Triangle count by direct set lookup over the ordered pair
    list (a<b<c once each) — no join enumeration."""
    pairs, _, _ = _dup_graph(t)
    pset = set(pairs)
    nbrs: dict[int, list[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
    n_tri = 0
    for a, bs in nbrs.items():
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                if (bs[i], bs[j]) in pset:
                    n_tri += 1
    return pd.DataFrame({"n_triangles": [n_tri]})


@replay("q_dup_degree_dist")
def r_dup_degree_dist(t: Tables) -> pd.DataFrame:
    _, _, deg = _dup_graph(t)
    dist: dict[int, int] = {}
    for d in deg.values():
        dist[d] = dist.get(d, 0) + 1
    return pd.DataFrame(
        sorted(dist.items()), columns=["degree", "n_nodes"]
    )


@replay("q_pagerank_dups")
def r_pagerank_dups(t: Tables) -> pd.DataFrame:
    """Textbook power iteration (5 rounds, d = 0.85, uniform init)
    over the undirected dup graph — the engine runs the same update
    as BSP joins; no sinks, so no dangling term."""
    _, edges, deg = _dup_graph(t)
    nodes = sorted(deg)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        s: dict[int, float] = {v: 0.0 for v in nodes}
        for src, dst in edges:
            s[dst] += rank[src] / deg[src]
        rank = {v: (1.0 - 0.85) / n + 0.85 * s[v] for v in nodes}
    return pd.DataFrame(
        [(v, deg[v], rank[v], rank[v] * n) for v in nodes],
        columns=["doc_id", "deg", "pagerank", "rank_rel"],
    )


@replay("q_hits_dups")
def r_hits_dups(t: Tables) -> pd.DataFrame:
    """HITS in exact ints (3 rounds, init 1, no in-loop
    normalization) on the DIRECTED graph doc_b -> doc_a; final
    relative scores are single divisions by the max."""
    pairs, _, _ = _dup_graph(t)
    e = [(b, a) for a, b in pairs]  # src=doc_b (newer), dst=doc_a
    nodes = sorted({x for pr in e for x in pr})
    a = {v: 1 for v in nodes}
    h = {v: 1 for v in nodes}
    for _ in range(3):
        a_new = {v: 0 for v in nodes}
        for s, d in e:
            a_new[d] += h[s]
        a = a_new
        h_new = {v: 0 for v in nodes}
        for s, d in e:
            h_new[s] += a[d]
        h = h_new
    ma, mh = max(a.values()), max(h.values())
    return pd.DataFrame(
        [
            (
                v, a[v], h[v],
                a[v] / ma if ma > 0 else 0.0,
                h[v] / mh if mh > 0 else 0.0,
            )
            for v in nodes
        ],
        columns=[
            "doc_id", "authority_raw", "hub_raw",
            "authority_rel", "hub_rel",
        ],
    )


@replay("q_ppr_influence")
def r_ppr_influence(t: Tables) -> pd.DataFrame:
    """Personalized PageRank (4 rounds, d = 0.85) with the %10 == 0
    seed set, textbook power iteration."""
    _, edges, deg = _dup_graph(t)
    nodes = sorted(deg)
    seeds = [v for v in nodes if v % PPR_SEED_MOD == 0]
    ns = len(seeds)
    rank = {v: (1.0 / ns if v % PPR_SEED_MOD == 0 else 0.0) for v in nodes}
    for _ in range(PPR_ITER):
        s: dict[int, float] = {v: 0.0 for v in nodes}
        for src, dst in edges:
            s[dst] += rank[src] / deg[src]
        rank = {
            v: (1.0 - PPR_D) * ((1.0 / ns) if v % PPR_SEED_MOD == 0 else 0.0)
            + PPR_D * s[v]
            for v in nodes
        }
    return pd.DataFrame(
        [
            (v, deg[v], int(v % PPR_SEED_MOD == 0), rank[v])
            for v in nodes
        ],
        columns=["doc_id", "deg", "is_seed", "ppr"],
    )


@replay("q_assortativity")
def r_assortativity(t: Tables) -> pd.DataFrame:
    """Newman degree assortativity: Pearson r of endpoint degrees
    over the directed edge list, exact integer moments."""
    _, edges, deg = _dup_graph(t)
    n = len(edges)
    sx = sum(deg[s] for s, _ in edges)
    sy = sum(deg[d] for _, d in edges)
    sxy = sum(deg[s] * deg[d] for s, d in edges)
    sxx = sum(deg[s] ** 2 for s, _ in edges)
    syy = sum(deg[d] ** 2 for _, d in edges)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    den = math.sqrt(vx * vy)
    r = 0.0 if den == 0.0 else float(n * sxy - sx * sy) / den
    return pd.DataFrame({"n_edges": [n], "assortativity": [r]})


@replay("q_clustering_coeff")
def r_clustering_coeff(t: Tables) -> pd.DataFrame:
    """Local clustering coefficient: per-node triangle membership /
    C(deg, 2), triangles by set lookup."""
    pairs, _, deg = _dup_graph(t)
    pset = set(pairs)
    nbrs: dict[int, list[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
    n_tri: dict[int, int] = {}
    for a, bs in nbrs.items():
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                if (bs[i], bs[j]) in pset:
                    for v in (a, bs[i], bs[j]):
                        n_tri[v] = n_tri.get(v, 0) + 1
    rows = []
    for v in sorted(deg):
        d = deg[v]
        tri = n_tri.get(v, 0)
        c = 0.0 if d < 2 else tri * 2 / (d * (d - 1))
        rows.append((v, d, tri, c))
    return pd.DataFrame(
        rows, columns=["doc_id", "deg", "n_tri", "clustering"]
    )


@replay("q_kcore_peel")
def r_kcore_peel(t: Tables) -> pd.DataFrame:
    """k-core (k = 3) of the part co-purchase graph (edges = part
    pairs sharing >= 2 baskets) by 4 peel rounds of degree < 3
    removal — direct dict arithmetic."""
    li = t.lineitem
    baskets: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(o), set()).add(int(p))
    w: dict = {}
    for items in baskets.values():
        fi = sorted(items)
        for i in range(len(fi)):
            for j in range(i + 1, len(fi)):
                w[(fi[i], fi[j])] = w.get((fi[i], fi[j]), 0) + 1
    edges = [pr for pr, c in w.items() if c >= 2]
    for _ in range(4):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 3}
        edges = [(a, b) for a, b in edges if a in keep and b in keep]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return pd.DataFrame(
        sorted(deg.items()), columns=["part", "degree"]
    )


# ---------------------------------------------------------------------------
# round-12 wave 4: retrieval / quality-rule family
# ---------------------------------------------------------------------------

BM25_TERMS = ["filter", "join", "stream"]  # queries/text.py BM25_TERMS
BM25_K = 20  # queries/text.py BM25_K
TEXTRANK_TOP = 30  # queries/text.py TEXTRANK_TOP
CMS_DEPTH = 4  # operators/sketch.py CMS_DEPTH
CMS_WIDTH = 64  # operators/sketch.py CMS_WIDTH


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


@replay("q_tfidf_top_terms")
def r_tfidf_top_terms(t: Tables) -> pd.DataFrame:
    """Smooth-idf TF-IDF top-5 per doc: score = tf (ln((N+1)/(df+1))
    + 1), rounded to 6 dp BEFORE ranking (score desc, token asc)."""
    d = t.documents
    n_docs = len(d)
    tf: dict = {}
    df: dict = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        cnt: dict = {}
        for tok in _ftoks(text):
            cnt[tok] = cnt.get(tok, 0) + 1
        tf[int(doc_id)] = cnt
        for tok in cnt:
            df[tok] = df.get(tok, 0) + 1
    rows = []
    for doc_id, cnt in tf.items():
        scored = [
            (
                tok,
                c,
                _round6(c * (math.log((n_docs + 1) / (df[tok] + 1)) + 1)),
            )
            for tok, c in cnt.items()
        ]
        scored.sort(key=lambda r: (-r[2], r[0]))
        for rank, (tok, c, s) in enumerate(scored[:5], start=1):
            rows.append((doc_id, rank, tok, c, s))
    df_out = pd.DataFrame(
        rows, columns=["doc_id", "rank", "token", "tf", "score"]
    )
    df_out["rank"] = df_out["rank"].astype(np.int32)
    return df_out


@replay("q_bm25_topk")
def r_bm25_topk(t: Tables) -> pd.DataFrame:
    """Okapi BM25 (k1 = 1.2, b = 0.75, probabilistic idf) for the
    pinned query terms; per-doc sums rounded to 6 dp before the
    (bm25 desc, doc_id) top-k."""
    d = t.documents
    k1, b = 1.2, 0.75
    dls: dict[int, int] = {}
    tfs: dict = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = _ftoks(text)
        dls[int(doc_id)] = len(toks)
        for q in BM25_TERMS:
            c = sum(1 for x in toks if x == q)
            if c:
                tfs[(int(doc_id), q)] = c
    df_t: dict[str, int] = {}
    for (_, q) in tfs:
        df_t[q] = df_t.get(q, 0) + 1
    n_docs = len(d)
    sum_dl = sum(dls.values())
    agg: dict[int, list] = {}
    for (doc_id, q), tf in tfs.items():
        idf = math.log((n_docs - df_t[q] + 0.5) / (df_t[q] + 0.5) + 1)
        denom = tf + k1 * (1 - b + b * dls[doc_id] * n_docs / sum_dl)
        part = idf * tf * (k1 + 1) / denom
        row = agg.setdefault(doc_id, [0.0, 0])
        row[0] += part
        row[1] += 1
    scored = sorted(
        ((doc_id, _round6(s), nh) for doc_id, (s, nh) in agg.items()),
        key=lambda r: (-r[1], r[0]),
    )[:BM25_K]
    out = pd.DataFrame(
        [(i + 1, doc_id, s, nh) for i, (doc_id, s, nh) in enumerate(scored)],
        columns=["rank", "doc_id", "bm25", "n_terms_hit"],
    )
    out["rank"] = out["rank"].astype(np.int32)
    return out


@replay("q_cms_heavy_hitters")
def r_cms_heavy_hitters(t: Tables) -> pd.DataFrame:
    """Count-min sketch (4 x 64, portable md5 'cms<seed>' hashes)
    rebuilt from scratch; estimate = min cell over seeds; candidates
    = exact top-20 tokens."""
    counts: dict[str, int] = {}
    for text in t.documents["text"]:
        for tok in _ftoks(text):
            counts[tok] = counts.get(tok, 0) + 1
    cells: dict = {}
    for tok, c in counts.items():
        for seed in range(CMS_DEPTH):
            bucket = _portable_hash(tok, salt=f"cms{seed}") % CMS_WIDTH
            cells[(seed, bucket)] = cells.get((seed, bucket), 0) + c
    cand = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = []
    for tok, exact in cand:
        est = min(
            cells.get(
                (seed, _portable_hash(tok, salt=f"cms{seed}") % CMS_WIDTH), 0
            )
            for seed in range(CMS_DEPTH)
        )
        rows.append((tok, exact, est, est - exact))
    return pd.DataFrame(
        rows, columns=["token", "exact_n", "cms_n", "overcount"]
    )


@replay("q_gopher_rules")
def r_gopher_rules(t: Tables) -> pd.DataFrame:
    """Gopher quality rules from the paper's definitions: word count,
    mean word length, symbol ratio ('#' / '...'), alpha-word ratio,
    stopword hits, and the conjunctive gate."""
    import re

    stop = set(LANG_MARKERS["en"])
    sym_re = re.compile(r"#|\.\.\.")
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        words = _ftoks(text)
        nw = len(words)
        nonspace = len(text.replace(" ", ""))
        nsym = len(sym_re.findall(text))
        nalpha = sum(1 for w in words if re.search(r"[A-Za-z]", w))
        shits = sum(1 for w in words if w in stop)
        mwl = nonspace / nw
        symr = nsym / nw
        alphar = nalpha / nw
        ok_wc = 50 <= nw <= 100000
        ok_mwl = 3.0 <= mwl <= 10.0
        ok_sym = symr <= 0.1
        ok_alpha = alphar >= 0.8
        ok_stop = shits >= 2
        rows.append(
            (
                int(doc_id), nw, mwl, symr, alphar, shits,
                ok_wc, ok_mwl, ok_sym, ok_alpha, ok_stop,
                ok_wc and ok_mwl and ok_sym and ok_alpha and ok_stop,
            )
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "doc_id", "n_words", "mean_word_len", "symbol_ratio",
            "alpha_word_ratio", "stop_hits", "ok_word_count",
            "ok_mean_word_len", "ok_symbol_ratio", "ok_alpha_words",
            "ok_stopwords", "passes_gopher",
        ],
    )
    out["n_words"] = out["n_words"].astype(np.int32)
    out["stop_hits"] = out["stop_hits"].astype(np.int32)
    return out


@replay("q_textrank_keywords")
def r_textrank_keywords(t: Tables) -> pd.DataFrame:
    """TextRank: PageRank (5 rounds, d = 0.85) over the deduplicated
    undirected adjacent-token graph; top-30 by (rounded rank desc,
    token)."""
    edges = set()
    for text in t.documents["text"]:
        toks = _ftoks(text)
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted(deg)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        s: dict[str, float] = {v: 0.0 for v in nodes}
        for src, dst in edges:
            s[dst] += rank[src] / deg[src]
        rank = {v: (1.0 - 0.85) / n + 0.85 * s[v] for v in nodes}
    scored = sorted(
        ((v, deg[v], _round6(rank[v])) for v in nodes),
        key=lambda r: (-r[2], r[0]),
    )[:TEXTRANK_TOP]
    return pd.DataFrame(scored, columns=["token", "deg", "pagerank"])


# ---------------------------------------------------------------------------
# round-12 wave 5: LPA/BFS/link-pred, BLEU, passages, lang-ID family,
# hashing splits, winnowing, source scorecards
# ---------------------------------------------------------------------------

BFS_SEED_MOD = 10  # queries/dedup.py BFS_SEED_MOD
BFS_MAX_HOPS = 4  # queries/dedup.py BFS_MAX_HOPS
PASSAGE_W = 16  # queries/dedup.py PASSAGE_W
WINNOW_K = 4  # queries/text.py WINNOW_K
WINNOW_W = 5  # queries/text.py WINNOW_W
FH_BUCKETS = 16  # queries/text.py FH_BUCKETS
SPLIT_RATIOS = {"train": 0.9, "val": 0.05, "test": 0.05}  # queries/text.py


@replay("q_lpa_communities")
def r_lpa_communities(t: Tables) -> pd.DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), 4 rounds,
    self-vote, most-frequent label with min-label ties — direct dict
    arithmetic over the near-dup graph."""
    _, edges, deg = _dup_graph(t)
    nodes = sorted(deg)
    nbrs: dict[int, list[int]] = {}
    for s, d in edges:
        nbrs.setdefault(d, []).append(s)
    label = {v: v for v in nodes}
    for _ in range(4):
        new = {}
        for v in nodes:
            votes: dict[int, int] = {label[v]: 1}  # self-vote
            for u in nbrs.get(v, []):
                votes[label[u]] = votes.get(label[u], 0) + 1
            new[v] = min(
                votes, key=lambda lb: (-votes[lb], lb)
            )  # max count, ties -> smallest label
        label = new
    sizes: dict[int, int] = {}
    for lb in label.values():
        sizes[lb] = sizes.get(lb, 0) + 1
    return pd.DataFrame(
        [(v, label[v], sizes[label[v]]) for v in nodes],
        columns=["doc_id", "community", "community_size"],
    )


@replay("q_graph_bfs")
def r_graph_bfs(t: Tables) -> pd.DataFrame:
    """Bounded-hop BFS (4 hops of min-plus relaxation) from the
    %10 == 0 seed set; unreached nodes absent."""
    _, edges, deg = _dup_graph(t)
    dist = {v: 0 for v in deg if v % BFS_SEED_MOD == 0}
    for _ in range(BFS_MAX_HOPS):
        new = dict(dist)
        for s, d in edges:
            if s in dist:
                cand = dist[s] + 1
                if d not in new or cand < new[d]:
                    new[d] = cand
        dist = new
    out = pd.DataFrame(
        sorted(dist.items()), columns=["doc_id", "dist"]
    )
    out["dist"] = out["dist"].astype(np.int32)
    return out


@replay("q_link_prediction")
def r_link_prediction(t: Tables) -> pd.DataFrame:
    """Common-neighbor link prediction on the part co-purchase graph:
    non-edge pairs with >= 2 shared neighbors; Jaccard = cn /
    (deg_u + deg_v - cn) as the exact half-away 4-decimal ratio."""
    li = t.lineitem
    baskets: dict[int, set] = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets.setdefault(int(o), set()).add(int(p))
    w: dict = {}
    for items in baskets.values():
        fi = sorted(items)
        for i in range(len(fi)):
            for j in range(i + 1, len(fi)):
                w[(fi[i], fi[j])] = w.get((fi[i], fi[j]), 0) + 1
    eset = {pr for pr, c in w.items() if c >= 2}
    nbr: dict[int, set] = {}
    for a, b in eset:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    rows = []
    seen = set()
    for mid, ns in nbr.items():
        ns_sorted = sorted(ns)
        for i in range(len(ns_sorted)):
            for j in range(i + 1, len(ns_sorted)):
                u, v = ns_sorted[i], ns_sorted[j]
                if (u, v) in seen or (u, v) in eset:
                    continue
                cn = len(nbr[u] & nbr[v])
                if cn >= 2:
                    seen.add((u, v))
                    du, dv = len(nbr[u]), len(nbr[v])
                    rows.append(
                        (u, v, cn, du, dv,
                         _half_away_ratio(cn, du + dv - cn, 4))
                    )
    return pd.DataFrame(
        rows, columns=["u", "v", "cn", "deg_u", "deg_v", "jacc"]
    )


@replay("q_pair_bleu")
def r_pair_bleu(t: Tables) -> pd.DataFrame:
    """BLEU-2 over the MinHash candidate pairs (hypothesis = doc_b,
    reference = doc_a): clipped 1/2-gram precisions in exact ints,
    brevity penalty, geometric mean; zero clip -> 0."""
    pairs, _, _ = _dup_graph(t)
    d = t.documents.set_index("doc_id")

    def grams(doc_id):
        toks = _ftoks(d.loc[doc_id, "text"])
        uni: dict = {}
        for x in toks:
            uni[x] = uni.get(x, 0) + 1
        bi: dict = {}
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            bi[g] = bi.get(g, 0) + 1
        return len(toks), uni, bi

    rows = []
    for da, db in pairs:
        len_ref, uni_r, bi_r = grams(da)
        len_hyp, uni_h, bi_h = grams(db)
        clip1 = sum(min(c, uni_r.get(g, 0)) for g, c in uni_h.items())
        tot1 = sum(uni_h.values())
        clip2 = sum(min(c, bi_r.get(g, 0)) for g, c in bi_h.items())
        tot2 = sum(bi_h.values())
        if clip1 == 0 or clip2 == 0:
            bleu = 0.0
        else:
            p1, p2 = clip1 / tot1, clip2 / tot2
            bp = (
                1.0
                if len_hyp > len_ref
                else math.exp(1.0 - len_ref / len_hyp)
            )
            bleu = bp * math.exp((math.log(p1) + math.log(p2)) / 2.0)
        rows.append(
            (da, db, len_ref, len_hyp, clip1, tot1, clip2, tot2, bleu)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_a", "doc_b", "len_ref", "len_hyp",
            "clip1", "tot1", "clip2", "tot2", "bleu2",
        ],
    )


@replay("q_passage_dup_ratio")
def r_passage_dup_ratio(t: Tables) -> pd.DataFrame:
    """Non-overlapping 16-token passages (trailing partial kept),
    md5 fingerprints, global copy counts, per-doc duplicated ratio."""
    import hashlib

    chunks = []  # (doc_id, fp)
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _ftoks(text)
        if not toks:
            continue
        for i in range(0, len(toks), PASSAGE_W):
            fp = hashlib.md5(
                " ".join(toks[i : i + PASSAGE_W]).encode()
            ).hexdigest()
            chunks.append((int(doc_id), fp))
    copies: dict[str, int] = {}
    for _, fp in chunks:
        copies[fp] = copies.get(fp, 0) + 1
    agg: dict[int, list] = {}
    for doc_id, fp in chunks:
        row = agg.setdefault(doc_id, [0, 0])
        row[0] += 1
        row[1] += int(copies[fp] > 1)
    return pd.DataFrame(
        [(d_, n, k, k / n) for d_, (n, k) in sorted(agg.items())],
        columns=["doc_id", "n_passages", "n_dup_passages", "dup_ratio"],
    )


def _lang_cells(t: Tables) -> dict:
    """Declared x guessed confusion cells via the independently
    re-derived stopword-hit guesser (r_lang_id rule)."""
    cells: dict = {}
    for lang, text in zip(t.documents["lang"], t.documents["text"]):
        toks = text.split(" ")
        hits = {
            lg: sum(1 for tok in toks if tok in mk)
            for lg, mk in LANG_MARKERS.items()
        }
        best = max(hits.values())
        guess = "und" if best == 0 else min(
            lg for lg, h in hits.items() if h == best
        )
        cells[(str(lang), guess)] = cells.get((str(lang), guess), 0) + 1
    return cells


@replay("q_lang_confusion")
def r_lang_confusion(t: Tables) -> pd.DataFrame:
    cells = _lang_cells(t)
    row_n: dict = {}
    for (a, _), n in cells.items():
        row_n[a] = row_n.get(a, 0) + n
    return pd.DataFrame(
        [
            (a, b, n, n / row_n[a])
            for (a, b), n in sorted(cells.items())
        ],
        columns=["lang_declared", "lang_guess", "n_docs", "share_of_declared"],
    )


@replay("q_class_f1")
def r_class_f1(t: Tables) -> pd.DataFrame:
    """Per-class precision/recall/F1 from the confusion cells; zero
    denominators -> 0."""
    cells = _lang_cells(t)
    row_n: dict = {}
    col_n: dict = {}
    tp: dict = {}
    for (a, b), n in cells.items():
        row_n[a] = row_n.get(a, 0) + n
        col_n[b] = col_n.get(b, 0) + n
        if a == b:
            tp[a] = n
    rows = []
    for cls in sorted(set(row_n) | set(col_n)):
        tpp = tp.get(cls, 0)
        fp = col_n.get(cls, 0) - tpp
        fn = row_n.get(cls, 0) - tpp
        prec = 0.0 if tpp + fp == 0 else tpp / (tpp + fp)
        rec = 0.0 if tpp + fn == 0 else tpp / (tpp + fn)
        f1 = 0.0 if prec + rec == 0.0 else 2.0 * prec * rec / (prec + rec)
        rows.append((cls, tpp, fp, fn, prec, rec, f1))
    return pd.DataFrame(
        rows, columns=["cls", "tp", "fp", "fn", "precision", "recall", "f1"]
    )


@replay("q_feature_hashing")
def r_feature_hashing(t: Tables) -> pd.DataFrame:
    """Hashing-trick features: portable 60-bit md5 'fh' hash, bucket =
    h mod 16, sign from bit 4; per (doc, bucket) signed sums."""
    agg: dict = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        for tok in _ftoks(text):
            h = _portable_hash(tok, salt="fh")
            bucket = h % FH_BUCKETS
            sign = 1 - 2 * ((h >> 4) % 2)
            key = (int(doc_id), bucket)
            agg[key] = agg.get(key, 0) + sign
    out = pd.DataFrame(
        [(d_, b, v) for (d_, b), v in sorted(agg.items())],
        columns=["doc_id", "bucket", "val"],
    )
    out["bucket"] = out["bucket"].astype(np.int32)
    return out


@replay("q_hash_split")
def r_hash_split(t: Tables) -> pd.DataFrame:
    """Content-hash dataset split: bucket = portable 'split' hash mod
    10000; thresholds from the ratio table sorted by (-frac, name)."""
    cum = 0.0
    cases = []
    for name, frac in sorted(
        SPLIT_RATIOS.items(), key=lambda kv: (-kv[1], kv[0])
    ):
        cum += frac
        cases.append((int(round(cum * 10_000)), name))
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        bucket = _portable_hash(text, salt="split") % 10_000
        split = cases[-1][1]
        for thresh, name in cases[:-1]:
            if bucket < thresh:
                split = name
                break
        rows.append((int(doc_id), bucket, split))
    return pd.DataFrame(rows, columns=["doc_id", "bucket", "split"])


@replay("q_winnow_fingerprints")
def r_winnow_fingerprints(t: Tables) -> pd.DataFrame:
    """Winnowing (Schleimer et al. 2003): k-gram portable hashes over
    the RAW token split, min per w-window, distinct per doc; docs
    shorter than k + w - 1 tokens emit nothing."""
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = text.split(" ")  # raw split, engine parity
        if len(toks) < WINNOW_K + WINNOW_W - 1:
            continue
        hs = [
            _portable_hash(" ".join(toks[i : i + WINNOW_K]))
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        fps = {
            min(hs[j : j + WINNOW_W])
            for j in range(len(hs) - WINNOW_W + 1)
        }
        rows.extend((int(doc_id), fp) for fp in sorted(fps))
    return pd.DataFrame(rows, columns=["doc_id", "fp"])


@replay("q_source_stats")
def r_source_stats(t: Tables) -> pd.DataFrame:
    """Per-source scorecard: docs, unique texts (md5), dup docs,
    total chars."""
    import hashlib

    per: dict = {}
    for src, text, nc in zip(
        t.documents["source"], t.documents["text"], t.documents["n_chars"]
    ):
        fp = hashlib.md5(text.encode()).hexdigest()
        row = per.setdefault((str(src), fp), [0, 0])
        row[0] += 1
        row[1] += int(nc)
    agg: dict = {}
    for (src, _), (cnt, chars) in per.items():
        row = agg.setdefault(src, [0, 0, 0, 0])
        row[0] += cnt
        row[1] += 1
        row[2] += cnt - 1
        row[3] += chars
    return pd.DataFrame(
        [(s, a, b, c, d_) for s, (a, b, c, d_) in sorted(agg.items())],
        columns=[
            "source", "n_docs", "n_unique_texts", "n_dup_docs", "total_chars"
        ],
    )


@replay("q_dup_rate_by_source")
def r_dup_rate_by_source(t: Tables) -> pd.DataFrame:
    import hashlib

    per: dict = {}
    for src, text in zip(t.documents["source"], t.documents["text"]):
        fp = hashlib.md5(text.encode()).hexdigest()
        per.setdefault(str(src), set()).add(fp)
    counts: dict = {}
    for src in t.documents["source"]:
        counts[str(src)] = counts.get(str(src), 0) + 1
    return pd.DataFrame(
        [
            (s, counts[s], len(fps), 1.0 - len(fps) / counts[s])
            for s, fps in sorted(per.items())
        ],
        columns=["source", "n_docs", "n_distinct", "dup_rate"],
    )


# ---------------------------------------------------------------------------
# round-12 wave 6: vector retrieval family (SRP LSH, KNN join, nDCG,
# recall evals, MMR, RRF, centroids)
# ---------------------------------------------------------------------------

PLANES = 8  # queries/similarity.py PLANES
KNN_QUERY_MOD = 20  # queries/similarity.py KNN_QUERY_MOD
MATRYOSHKA_DIM = 16  # queries/similarity.py MATRYOSHKA_DIM
MMR_POOL = 10  # queries/similarity.py MMR_POOL
MMR_K = 3  # queries/similarity.py MMR_K
MMR_LAM = 0.7  # queries/similarity.py MMR_LAM
RRF_K = 60  # queries/similarity.py RRF_K
RRF_DEPTH = 20  # queries/similarity.py RRF_DEPTH
RRF_TOP = 10  # queries/similarity.py RRF_TOP
RRF_QUERY_VEC = 0  # queries/similarity.py RRF_QUERY_VEC


def _hyperplanes(dim: int, planes: int) -> np.ndarray:
    """Deterministic +/-1 SRP hyperplanes from md5(p|d) — re-derived
    from the documented spec, not imported."""
    import hashlib

    out = np.empty((planes, dim))
    for p in range(planes):
        for d in range(dim):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            out[p, d] = 1.0 if int(h[:2], 16) % 2 == 0 else -1.0
    return out


def _srp_buckets(m: np.ndarray) -> np.ndarray:
    hp = _hyperplanes(DIM, PLANES)
    dots = m @ hp.T  # (N, planes)
    bits = (dots >= 0).astype(np.int64)
    return (bits * (1 << np.arange(PLANES))).sum(axis=1)


@replay("q_embedding_centroids")
def r_embedding_centroids(t: Tables) -> pd.DataFrame:
    e = t.embeddings
    sums: dict = {}
    for lab, v in zip(e["label"], e["embedding"]):
        arr = np.asarray(v, dtype=np.float64)
        row = sums.setdefault(str(lab), [np.zeros(DIM), 0])
        row[0] += arr
        row[1] += 1
    rows = []
    for lab, (s, n) in sorted(sums.items()):
        for i in range(DIM):
            rows.append((lab, i, s[i] / n))
    out = pd.DataFrame(rows, columns=["label", "dim_idx", "mean_val"])
    out["dim_idx"] = out["dim_idx"].astype(np.int32)
    return out


@replay("q_semantic_search")
def r_semantic_search(t: Tables) -> pd.DataFrame:
    """Brute-force top-3 per query joined to the matched doc's
    metadata."""
    ids, m = _emb_matrix(t)
    hits = _topk_frame(
        ids, m, lambda qi: _rounded_cos(m[qi], m), 3, "cos_sim"
    )
    d = t.documents.set_index("doc_id")
    hits["lang"] = [d.loc[c, "lang"] for c in hits["cand_id"]]
    hits["source"] = [d.loc[c, "source"] for c in hits["cand_id"]]
    return hits


def _exact_topk_ids(ids, m, k, dim=None):
    """Per query: top-k candidate ids by (6-dp cosine desc, id)."""
    mm = m if dim is None else m[:, :dim]
    out: dict[int, list[int]] = {}
    for qi in np.nonzero(ids % QUERY_MOD == 0)[0]:
        sims = _rounded_cos(mm[qi], mm)
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], -sims[mask]))[:k]
        out[int(ids[qi])] = [int(x) for x in ids[mask][order]]
    return out


@replay("q_ann_recall")
def r_ann_recall(t: Tables) -> pd.DataFrame:
    """Recall@k of same-SRP-bucket retrieval vs exact brute force."""
    ids, m = _emb_matrix(t)
    exact = _exact_topk_ids(ids, m, TOPK)
    buckets = _srp_buckets(m)
    rows = []
    for qid, exact_ids in sorted(exact.items()):
        qi = int(np.nonzero(ids == qid)[0][0])
        mask = (buckets == buckets[qi]) & (ids != qid)
        sims = _rounded_cos(m[qi], m[mask])
        order = np.lexsort((ids[mask], -sims))[:TOPK]
        approx_ids = set(int(x) for x in ids[mask][order])
        hits = sum(1 for x in exact_ids if x in approx_ids)
        rows.append((qid, hits / len(exact_ids)))
    return pd.DataFrame(rows, columns=["query_id", "recall"])


@replay("q_matryoshka_recall")
def r_matryoshka_recall(t: Tables) -> pd.DataFrame:
    """Recall@k of exact search on the first 16 dims vs the full 64."""
    ids, m = _emb_matrix(t)
    exact = _exact_topk_ids(ids, m, TOPK)
    approx = _exact_topk_ids(ids, m, TOPK, dim=MATRYOSHKA_DIM)
    rows = [
        (
            qid,
            sum(1 for x in exact_ids if x in set(approx[qid]))
            / len(exact_ids),
        )
        for qid, exact_ids in sorted(exact.items())
    ]
    return pd.DataFrame(rows, columns=["query_id", "recall_prefix"])


@replay("q_knn_join")
def r_knn_join(t: Tables) -> pd.DataFrame:
    """SRP-co-bucketed KNN join with Hamming-1 multiprobe: the 5%
    query set probes its own bucket plus each one-bit flip."""
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    rows = []
    for qi in np.nonzero(ids % KNN_QUERY_MOD == 0)[0]:
        probes = {int(buckets[qi])} | {
            int(buckets[qi]) ^ (1 << p) for p in range(PLANES)
        }
        mask = np.isin(buckets, list(probes)) & (ids != ids[qi])
        sims = _rounded_cos(m[qi], m[mask])
        order = np.lexsort((ids[mask], -sims))[:TOPK]
        for r, oi in enumerate(order, start=1):
            c4 = _spark_round(float(sims[oi]), 4)
            rows.append(
                (
                    int(ids[qi]), r, int(ids[mask][oi]),
                    math.floor(c4 * 100.0 + 0.5) / 100.0,
                )
            )
    out = pd.DataFrame(rows, columns=["query_id", "rank", "cand_id", "cos2"])
    out["rank"] = out["rank"].astype(np.int32)
    return out


@replay("q_ndcg_at_k")
def r_ndcg_at_k(t: Tables) -> pd.DataFrame:
    """nDCG@k over the KNN-join edges with label-match relevance:
    DCG = sum rel_r / log2(r+1), IDCG = prefix sum at n_rel."""
    edges = r_knn_join(t)
    lab = {
        int(v): str(lb)
        for v, lb in zip(t.embeddings["vec_id"], t.embeddings["label"])
    }
    disc = {r: 1.0 / math.log2(r + 1) for r in range(1, TOPK + 1)}
    idcg_prefix = {0: 0.0}
    for r in range(1, TOPK + 1):
        idcg_prefix[r] = idcg_prefix[r - 1] + disc[r]
    agg: dict[int, list] = {}
    for qid, rank, cid in zip(
        edges["query_id"], edges["rank"], edges["cand_id"]
    ):
        rel = int(lab[int(qid)] == lab[int(cid)])
        row = agg.setdefault(int(qid), [0, 0.0])
        row[0] += rel
        row[1] += rel * disc[int(rank)]
    rows = [
        (qid, n_rel, 0.0 if n_rel == 0 else dcg / idcg_prefix[n_rel])
        for qid, (n_rel, dcg) in sorted(agg.items())
    ]
    return pd.DataFrame(rows, columns=["query_id", "n_rel", "ndcg"])


@replay("q_mmr_rerank")
def r_mmr_rerank(t: Tables) -> pd.DataFrame:
    """Maximal-marginal-relevance re-ranking, the textbook greedy:
    pool = relevance top-10, then select argmax of
    lam*rel - (1-lam)*max-sim-to-selected, ties to smallest id."""
    ids, m = _emb_matrix(t)
    rows = []
    for qi in np.nonzero(ids % QUERY_MOD == 0)[0]:
        sims = _rounded_cos(m[qi], m)
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], -sims[mask]))[:MMR_POOL]
        pool = [
            (int(ids[mask][oi]), float(sims[mask][oi])) for oi in order
        ]
        vec = {cid: m[np.nonzero(ids == cid)[0][0]] for cid, _ in pool}
        selected = [pool[0]]
        for rank in range(2, MMR_K + 1):
            best = None
            for cid, rel in pool:
                if any(cid == s for s, _ in selected):
                    continue
                max_sim = max(
                    float(_rounded_cos(vec[cid], vec[s][None, :])[0])
                    for s, _ in selected
                )
                score = _spark_round(
                    MMR_LAM * rel - (1.0 - MMR_LAM) * max_sim, 6
                )
                if best is None or (-score, cid) < (-best[1], best[0]):
                    best = (cid, score, rel)
            selected.append((best[0], best[2]))
            rows.append(
                (
                    int(ids[qi]), rank, best[0],
                    _spark_round(best[2], 4), _spark_round(best[1], 4),
                )
            )
        rows.append(
            (
                int(ids[qi]), 1, pool[0][0],
                _spark_round(pool[0][1], 4), _spark_round(pool[0][1], 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["query_id", "mmr_rank", "cand_id", "relevance", "mmr_score"],
    )


@replay("q_hybrid_rrf")
def r_hybrid_rrf(t: Tables) -> pd.DataFrame:
    """Reciprocal-rank fusion of the BM25 top-20 and the cosine
    top-20 for the pinned query vector: rrf = sum 1/(60 + rank)."""
    lex_df = r_bm25_topk(t)
    lex = {
        int(d): int(r)
        for d, r in zip(lex_df["doc_id"], lex_df["rank"])
        if int(r) <= RRF_DEPTH
    }
    ids, m = _emb_matrix(t)
    qi = int(np.nonzero(ids == RRF_QUERY_VEC)[0][0])
    sims = _rounded_cos(m[qi], m)
    mask = ids != RRF_QUERY_VEC
    order = np.lexsort((ids[mask], -sims[mask]))[:RRF_DEPTH]
    sem = {int(ids[mask][oi]): r for r, oi in enumerate(order, start=1)}
    fused = []
    for i in sorted(set(lex) | set(sem)):
        lr, sr = lex.get(i), sem.get(i)
        rrf = (1.0 / (RRF_K + lr) if lr else 0.0) + (
            1.0 / (RRF_K + sr) if sr else 0.0
        )
        fused.append((i, lr, sr, rrf))
    fused.sort(key=lambda r: (-r[3], r[0]))
    out = pd.DataFrame(
        [
            (rank, i, lr, sr, rrf)
            for rank, (i, lr, sr, rrf) in enumerate(
                fused[:RRF_TOP], start=1
            )
        ],
        columns=["fused_rank", "id", "lex_rank", "sem_rank", "rrf"],
    )
    return out


@replay("q_similarity_lsh_buckets")
def r_similarity_lsh_buckets(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    out = pd.DataFrame({"vec_id": ids, "bucket": buckets})
    out["bucket"] = out["bucket"].astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# wave 7: trained-model / fixed-point-iteration family — the engine
# and its oracle share the ITERATION (unrolled CTE twin), so these
# replays re-derive the trajectory a third way: dense numpy linear
# algebra or plain sequential Python, never per-step SQL.
# ---------------------------------------------------------------------------

# queries/text.py UNIGRAM_VOCAB (redeclared literally)
UNIGRAM_PIECES2 = "th he lo ow ue an ta al ne er ar in st re ey".split()
UNIGRAM_PIECES3 = (
    "the val row key tab sca fas joi agg mer fil win ord dat col vec "
    "bat spa gro sma lin cus que str has par slo".split()
)
UNIGRAM_VOCAB = {
    **{c: 3.0 for c in " abcdefghijklmnopqrstuvwxyz0123456789"},
    **{p: 4.5 for p in UNIGRAM_PIECES2},
    **{p: 5.5 for p in UNIGRAM_PIECES3},
}
UNIGRAM_UNK = 20.0  # single-char fallback cost (oracle CASE default)


@replay("q_unigram_segment_cost")
def r_unigram_segment_cost(t: Tables) -> pd.DataFrame:
    """SentencePiece-style unigram Viterbi, the textbook SEQUENTIAL
    per-position DP (the engine runs a vectorized position-stepped
    batch DP; the oracle a recursive CTE). State = (cost, n_pieces),
    lexicographic min — cost first, fewer pieces on ties."""
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        L = len(text)
        best = [(math.inf, 0)] * (L + 1)
        best[0] = (0.0, 0)
        for i in range(1, L + 1):
            # arm order: 1-char (always available, UNK fallback),
            # then longer pieces only when in vocab
            c1 = UNIGRAM_VOCAB.get(text[i - 1], UNIGRAM_UNK)
            cand = (best[i - 1][0] + c1, best[i - 1][1] + 1)
            for j in (2, 3):
                if i >= j:
                    piece = text[i - j : i]
                    if piece in UNIGRAM_VOCAB:
                        alt = (
                            best[i - j][0] + UNIGRAM_VOCAB[piece],
                            best[i - j][1] + 1,
                        )
                        if alt < cand:
                            cand = alt
            best[i] = cand
        rows.append(
            (int(doc_id), L, round(best[L][0], 2), int(best[L][1]))
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_chars", "seg_cost", "n_pieces"]
    )


# operators/quality.py constants (redeclared literally)
Q_SCALE = 1 << 20
Q_HALF = 1 << 19
Q_BUCKETS = 64
Q_NTOK = 64
Q_BIAS = 65
Q_NFEATS = 66
Q_LABEL_NUM = 25
Q_STEP_NUM = 2
Q_ITERS = 16


@replay("q_quality_classifier")
def r_quality_classifier(t: Tables) -> pd.DataFrame:
    """The fixed-point LR trainer re-run as DENSE numpy matrix
    algebra (the engine trains via distributed per-bucket aggregates,
    the oracle via an unrolled CTE chain): X is the full doc x 66
    integer count matrix, each step is one matvec + one matvec
    transpose, all in int64."""
    docs = t.documents.sort_values("doc_id").reset_index(drop=True)
    n = len(docs)
    X = np.zeros((n, Q_NFEATS), dtype=np.int64)
    y = np.zeros(n, dtype=np.int64)
    for r, text in enumerate(docs["text"]):
        toks = _tokens(text)
        for tok in toks:
            X[r, _portable_hash(tok, "qc") % Q_BUCKETS] += 1
        X[r, Q_NTOK] = len(toks)
        X[r, Q_BIAS] = 1
        y[r] = 1 if toks.count("the") * Q_LABEL_NUM >= len(toks) else 0
    ss = np.maximum((X * X).sum(axis=0), 1)
    w = np.zeros(Q_NFEATS, dtype=np.int64)
    for _ in range(Q_ITERS):
        z = X @ w
        sig = np.clip(Q_HALF + np.floor(z / 4.0).astype(np.int64), 0, Q_SCALE)
        resid = sig - y * Q_SCALE
        g = X.T @ resid
        w = w - np.floor(
            g.astype(np.float64) * Q_STEP_NUM / ss
        ).astype(np.int64)
    pred = ((X @ w) >= 0).astype(np.int64)
    out = (
        pd.DataFrame(
            {
                "source": docs["source"],
                "y": y,
                "pred": pred,
                "correct": (pred == y).astype(np.int64),
            }
        )
        .groupby("source", as_index=False)
        .agg(
            n_docs=("y", "size"),
            n_label_pos=("y", "sum"),
            n_pred_pos=("pred", "sum"),
            n_correct=("correct", "sum"),
        )
    )
    return out


DOREMI_ITERS = 5  # operators/quality.py DOREMI_ITERS
DOREMI_M0 = 1048576  # operators/quality.py DOREMI_M0


@replay("q_doremi_weights")
def r_doremi_weights(t: Tables) -> pd.DataFrame:
    """DoReMi multiplicative weights, plain dict loop: per-source
    unigram cross-entropy vs the corpus unigram LM, quantized to
    integer 1e-4 bits, then 5 exact-integer MW updates."""
    from collections import Counter

    per_src: dict[str, list[float]] = {}
    vocab: Counter = Counter()
    toks_by_src: dict[str, list[str]] = {}
    for src, text in zip(t.documents["source"], t.documents["text"]):
        toks_by_src.setdefault(str(src), []).extend(_tokens(text))
    for toks in toks_by_src.values():
        vocab.update(toks)
    total = sum(vocab.values())
    loss_e4: dict[str, int] = {}
    for src, toks in toks_by_src.items():
        bits = [-math.log2(vocab[tk] / total) for tk in toks]
        loss_e4[src] = int(_spark_round(sum(bits) / len(bits) * 10000, 0))
    m = {src: DOREMI_M0 for src in loss_e4}
    for _ in range(DOREMI_ITERS):
        avgl = int(
            math.floor(
                float(sum(m[s] * loss_e4[s] for s in m)) / sum(m.values())
            )
        )
        m = {
            s: int(
                math.floor(
                    m[s]
                    * (DOREMI_M0 + max(0, loss_e4[s] - avgl))
                    / float(DOREMI_M0)
                )
            )
            for s in m
        }
    total_m = sum(m.values())
    rows = [
        (
            s,
            loss_e4[s],
            int(math.floor(float(m[s]) * 1000000.0 / total_m)),
        )
        for s in sorted(m)
    ]
    return pd.DataFrame(rows, columns=["source", "loss_e4", "weight_ppm"])


PCA_POWER_ITERS = 8  # queries/similarity.py PCA_POWER_ITERS
PCA_Q_SCALE = 2  # queries/similarity.py PCA_Q_SCALE
PCA_V_SCALE = 128  # queries/similarity.py PCA_V_SCALE


@replay("q_pca_power")
def r_pca_power(t: Tables) -> pd.DataFrame:
    """Integer power iteration re-run densely: quantized gram by one
    numpy matmul, then the 8 rescaled steps."""
    _, m = _emb_matrix(t)
    X = np.trunc(m * (10**PCA_Q_SCALE)).astype(np.int64)
    G = X.T @ X
    v = np.full(64, PCA_V_SCALE, dtype=np.int64)
    for _ in range(PCA_POWER_ITERS):
        u = G @ v
        mx = max(int(np.max(np.abs(u))), 1)
        v = np.floor(
            (u * PCA_V_SCALE).astype(np.float64) / mx
        ).astype(np.int64)
    num = int(v @ G @ v)
    den = int(v @ v)
    ray = _spark_round(num / den / float(10 ** (2 * PCA_Q_SCALE)), 4)
    return pd.DataFrame(
        {
            "dim": np.arange(64, dtype=np.int32),
            "loading": v,
            "rayleigh": ray,
        }
    )


@replay("q_best_split")
def r_best_split(t: Tables) -> pd.DataFrame:
    """Decision-stump histogram split scan, plain dicts."""
    e = t.embeddings
    hist: dict[int, list[int]] = {}
    for v, lab in zip(e["embedding"], e["label"]):
        b = int(math.floor(float(v[0]) * 32))
        row = hist.setdefault(b, [0, 0])
        row[0 if int(lab) < 5 else 1] += 1
    tp = sum(r[0] for r in hist.values())
    tn = sum(r[1] for r in hist.values())
    rows, pos_l, neg_l = [], 0, 0
    for b in sorted(hist):
        pos_l += hist[b][0]
        neg_l += hist[b][1]
        acc = max(pos_l + tn - neg_l, neg_l + tp - pos_l)
        rows.append(
            (b, pos_l, neg_l, acc, _half_away_ratio(acc, tp + tn, 4))
        )
    return pd.DataFrame(
        rows, columns=["bin", "pos_l", "neg_l", "acc", "acc_rate"]
    )


@replay("q_pr_curve")
def r_pr_curve(t: Tables) -> pd.DataFrame:
    """Binned PR curve, descending threshold sweep over plain dicts."""
    e = t.embeddings
    hist: dict[int, list[int]] = {}
    for v, lab in zip(e["embedding"], e["label"]):
        b = int(math.floor(float(v[0]) * 32))
        row = hist.setdefault(b, [0, 0])
        row[0 if int(lab) < 5 else 1] += 1
    tp_all = sum(r[0] for r in hist.values())
    rows, tp, fp = [], 0, 0
    for b in sorted(hist, reverse=True):
        tp += hist[b][0]
        fp += hist[b][1]
        rows.append(
            (
                b,
                tp,
                fp,
                _half_away_ratio(tp, tp + fp, 4),
                _half_away_ratio(tp, tp_all, 4),
            )
        )
    return pd.DataFrame(
        rows, columns=["bin", "tp", "fp", "precision_d", "recall_d"]
    )


L_DIV_BUCKET = 200  # queries/dq.py L_DIV_BUCKET
T_CLOSE_X10000 = 3000  # queries/dq.py T_CLOSE_X10000


@replay("q_t_closeness")
def r_t_closeness(t: Tables) -> pd.DataFrame:
    """t-closeness TV distance from the textbook definition with
    cleared denominators, plain dict counting."""
    from collections import Counter

    d = t.documents
    per: Counter = Counter()
    for lang, src, n_chars in zip(d["lang"], d["source"], d["n_chars"]):
        per[(str(lang), str(src), int(n_chars) // L_DIV_BUCKET)] += 1
    cls: Counter = Counter()
    glob: Counter = Counter()
    for (lang, src, sens), n in per.items():
        cls[(lang, src)] += n
        glob[sens] += n
    n_tot = sum(per.values())
    rows = []
    for (lang, src), n_c in sorted(cls.items()):
        num = sum(
            abs(per.get((lang, src, sens), 0) * n_tot - n_s * n_c)
            for sens, n_s in glob.items()
        )
        den = 2 * n_c * n_tot
        p = 10**4
        q = (2 * num * p + den) // (2 * den)  # half-away, num >= 0
        rows.append((lang, src, n_c, q / p, 1 if q > T_CLOSE_X10000 else 0))
    return pd.DataFrame(
        rows, columns=["lang", "source", "cls_n", "t_close", "above_t"]
    )


TE_SMOOTH_M = 10  # queries/analytics.py q_target_encode literal m = 10


@replay("q_target_encode")
def r_target_encode(t: Tables) -> pd.DataFrame:
    """Smoothed mean target encoding with cleared denominators, exact
    integer cents arithmetic end-to-end."""
    li = t.lineitem[["l_partkey", "l_extendedprice"]]
    pt = t.part[["p_partkey", "p_brand"]]
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    cents = np.rint(j["l_extendedprice"].to_numpy(np.float64) * 100).astype(
        np.int64
    )
    agg: dict[str, list[int]] = {}
    for b, c in zip(j["p_brand"], cents):
        row = agg.setdefault(str(b), [0, 0])
        row[0] += 1
        row[1] += int(c)
    n_g = sum(r[0] for r in agg.values())
    t_g = sum(r[1] for r in agg.values())
    rows = []
    for brand, (n_c, sum_c) in sorted(agg.items()):
        # dec_ratio(num, den, num_scale=2, out=4):
        # a = num*100 (integral cents), b = den*100
        a = n_g * sum_c + TE_SMOOTH_M * t_g
        b = n_g * (n_c + TE_SMOOTH_M) * 100
        p = 10**4
        q = (2 * a * p + b) // (2 * b)
        rows.append((brand, n_c, sum_c / 100.0, q / p))
    return pd.DataFrame(rows, columns=["p_brand", "n_c", "sum_c", "enc"])


KL_VOCAB_SIZE = 40  # queries/text.py q_source_drift_kl vocab_size=40


@replay("q_source_drift_kl")
def r_source_drift_kl(t: Tables) -> pd.DataFrame:
    """Add-one-smoothed KL (bits) of each source's top-40-vocab token
    distribution vs the corpus, plain Counter arithmetic."""
    from collections import Counter

    corpus: Counter = Counter()
    by_src: dict[str, Counter] = {}
    for src, text in zip(t.documents["source"], t.documents["text"]):
        toks = _tokens(text)
        corpus.update(toks)
        by_src.setdefault(str(src), Counter()).update(toks)
    vocab = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
        :KL_VOCAB_SIZE
    ]
    n_corpus = sum(c for _, c in vocab)
    n_vocab = len(vocab)
    rows = []
    for src in sorted(by_src):
        cnt = by_src[src]
        n_src = sum(cnt.get(tok, 0) for tok, _ in vocab)
        kl = 0.0
        for tok, c_corpus in vocab:
            p = (cnt.get(tok, 0) + 1) / (n_src + n_vocab)
            qd = (c_corpus + 1) / (n_corpus + n_vocab)
            kl += p * math.log2(p / qd)
        rows.append((src, n_src, _spark_round(kl, 4)))
    return pd.DataFrame(
        rows, columns=["source", "n_vocab_tokens", "kl_bits"]
    )


LOF_FLAG_X1E6 = 1300000  # queries/similarity.py LOF_FLAG_X1E6


@replay("q_lof_outliers")
def r_lof_outliers(t: Tables) -> pd.DataFrame:
    """Local Outlier Factor from the Breunig et al. definition over
    the SAME declared SRP multiprobe-KNN graph, computed with plain
    Python dict/loops and exact integer decimal terms (the engine
    runs three distributed joins; the oracle one SQL pipeline)."""
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    by_bucket: dict[int, list[int]] = {}
    for idx, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(idx)
    n = len(ids)
    edges: dict[int, list[tuple[int, int]]] = {}
    for qi in range(n):
        probes = {int(buckets[qi])} | {
            int(buckets[qi]) ^ (1 << p) for p in range(PLANES)
        }
        cand = [
            ci
            for b in probes
            for ci in by_bucket.get(b, [])
            if ci != qi
        ]
        if not cand:
            continue
        cos6 = _rounded_cos(m[qi], m[cand])
        ranked = sorted(
            zip(cos6, (int(ids[c]) for c in cand)),
            key=lambda rc: (-rc[0], rc[1]),
        )[:TOPK]
        edges[int(ids[qi])] = [
            (cid, int(1000000 - math.floor(c * 1000000 + 0.5)))
            for c, cid in ranked
        ]
    kdist = {p: max(d for _, d in es) for p, es in edges.items()}
    n_nb = {p: len(es) for p, es in edges.items()}
    reach_sum = {
        p: max(sum(max(kdist[o], d) for o, d in es), 1)
        for p, es in edges.items()
    }
    rows = []
    for p, es in sorted(edges.items()):
        term_sum = 0  # integer micro-units (scale 6), exact decimal sum
        for o, _ in es:
            a = n_nb[o] * reach_sum[p]
            b = reach_sum[o] * n_nb[p] * n_nb[p]
            term_sum += (2 * a * 10**6 + b) // (2 * b)
        rows.append(
            (
                p,
                n_nb[p],
                kdist[p],
                term_sum / 1e6,
                1 if term_sum > LOF_FLAG_X1E6 else 0,
            )
        )
    return pd.DataFrame(
        rows, columns=["vec_id", "n_nb", "kdist", "lof", "is_outlier"]
    )


# ---------------------------------------------------------------------------
# wave 8: tokenizer trainers, KMV sketch algebra, LM statistics,
# weighted sampling — the engine trains via distributed aggregates /
# driver folds, the oracle via unrolled SQL; these replays run the
# textbook sequential algorithms over plain dicts.
# ---------------------------------------------------------------------------

BPE_N_MERGES = 6  # queries/text.py BPE_N_MERGES
# queries/text.py BPE_MERGES (the pinned applied-merge table)
BPE_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("e", "r"),
    ("i", "n"),
    ("a", "n"),
    ("o", "r"),
    ("s", "t"),
    ("an", "d"),
]


@replay("q_bpe_merges")
def r_bpe_merges(t: Tables) -> pd.DataFrame:
    """Textbook BPE trainer (Sennrich et al. 2016): word-type counts,
    then per round count adjacent symbol pairs (weighted, overlapping
    positions included), argmax by (count desc, pair asc) with a
    min-count-2 floor, and greedy left-to-right non-overlapping
    application."""
    from collections import Counter

    wc: Counter = Counter()
    for text in t.documents["text"]:
        wc.update(_tokens(text))
    syms = {w: list(w) for w in wc}
    rows = []
    for rank in range(1, BPE_N_MERGES + 1):
        pairs: Counter = Counter()
        for w, s in syms.items():
            c = wc[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        cand = [(c, p) for p, c in pairs.items() if c >= 2]
        if not cand:
            break
        c_best, (a, b) = min(cand, key=lambda cp: (-cp[0], cp[1]))
        rows.append((rank, a, b, c_best))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return pd.DataFrame(
        rows, columns=["merge_rank", "sym_a", "sym_b", "pair_count"]
    )


@replay("q_bpe_encode")
def r_bpe_encode(t: Tables) -> pd.DataFrame:
    """Apply the pinned merge table per document on symbol LISTS
    (the engine compiles it to a chain of string replaces; the oracle
    likewise) and roll token budgets up per language."""
    agg: dict[str, list[int]] = {}
    for lang, text in zip(t.documents["lang"], t.documents["text"]):
        s = list(text)
        for a, b in BPE_MERGES:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        n_spaces = text.count(" ")
        n_tok = len(s) - n_spaces
        n_chr = len(text) - n_spaces
        row = agg.setdefault(str(lang), [0, 0, 0])
        row[0] += 1
        row[1] += n_tok
        row[2] += n_chr
    rows = [
        (
            lang,
            n_docs,
            n_tokens,
            n_chars,
            _half_away_ratio(n_tokens, n_chars, 4),
        )
        for lang, (n_docs, n_tokens, n_chars) in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows,
        columns=["lang", "n_docs", "n_tokens", "n_chars", "fertility"],
    )


WP_TOPK = 64  # queries/text.py WP_TOPK
WP_MAXLEN = 4  # queries/text.py WP_MAXLEN


@replay("q_wordpiece_encode")
def r_wordpiece_encode(t: Tables) -> pd.DataFrame:
    """WordPiece induction + greedy max-munch, re-derived over plain
    dicts from the published definition."""
    from collections import Counter

    doc_words: dict[int, Counter] = {}
    wc: Counter = Counter()
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        doc_words[int(doc_id)] = Counter(toks)
        wc.update(toks)
    counts: dict[int, Counter] = {0: Counter(), 1: Counter()}
    chars: dict[int, set] = {0: set(), 1: set()}
    for w, c in wc.items():
        for p in range(len(w)):
            cls = 0 if p == 0 else 1
            chars[cls].add(w[p])
            for L in range(2, WP_MAXLEN + 1):
                if p + L <= len(w):
                    counts[cls][w[p : p + L]] += c
    vocab: dict[int, set] = {}
    for cls in (0, 1):
        top = sorted(counts[cls].items(), key=lambda kv: (-kv[1], kv[0]))[
            :WP_TOPK
        ]
        vocab[cls] = chars[cls] | {p for p, _ in top}

    def encode_len(w: str) -> int:
        pos, n = 0, 0
        while pos < len(w):
            cls = 0 if pos == 0 else 1
            match = 1
            for L in range(2, WP_MAXLEN + 1):
                if pos + L <= len(w) and w[pos : pos + L] in vocab[cls]:
                    match = L
            pos += match
            n += 1
        return n

    np_of = {w: encode_len(w) for w in wc}
    rows = []
    for doc_id in sorted(doc_words):
        cnts = doc_words[doc_id]
        n_tokens = sum(cnts.values())
        n_pieces = sum(c * np_of[w] for w, c in cnts.items())
        rows.append(
            (
                doc_id,
                n_tokens,
                n_pieces,
                _half_away_ratio(n_pieces, n_tokens, 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_tokens", "n_pieces", "pieces_per_token"],
    )


KMV_MAX = (1 << 60) - 1  # operators/sketch.py KMV_MAX


def _kmv_est(n_kept: int, kth: int) -> int:
    if n_kept < KMV_K:
        return n_kept
    n2 = 2 * (KMV_K - 1) * KMV_MAX
    return (n2 + kth) // (2 * kth)


@replay("q_kmv_distinct")
def r_kmv_distinct(t: Tables) -> pd.DataFrame:
    """KMV distinct sketch per source from the definition: k smallest
    distinct 60-bit hashes, (k-1)/normalized-kth estimator."""
    by_src: dict[str, set] = {}
    exact: dict[str, set] = {}
    for src, text in zip(t.documents["source"], t.documents["text"]):
        s = str(src)
        toks = set(_tokens(text))
        exact.setdefault(s, set()).update(toks)
        by_src.setdefault(s, set()).update(
            _portable_hash(tok, "kmv") for tok in toks
        )
    rows = []
    for src in sorted(by_src):
        kept = sorted(by_src[src])[:KMV_K]
        kth, n_kept = kept[-1], len(kept)
        est = _kmv_est(n_kept, kth)
        n_exact = len(exact[src])
        rel = (2 * abs(est - n_exact) * 10000 + n_exact) // (2 * n_exact)
        rows.append((src, n_kept, est, n_exact, rel))
    return pd.DataFrame(
        rows,
        columns=[
            "source",
            "n_kept",
            "est_distinct",
            "n_exact",
            "rel_err_x10000",
        ],
    )


@replay("q_hll_rollup")
def r_hll_rollup(t: Tables) -> pd.DataFrame:
    """Daily KMV build -> union-merge -> estimate, plain sets."""
    daily: dict[tuple, set] = {}
    for ts, et, uid in zip(
        t.events["ts"], t.events["event_type"], t.events["user_id"]
    ):
        d = pd.Timestamp(ts).date()
        daily.setdefault((d, str(et)), set()).add(
            _portable_hash(str(int(uid)), "kmv")
        )
    merged: dict[str, set] = {}
    n_days: dict[str, set] = {}
    for (d, et), hvs in daily.items():
        kept = sorted(hvs)[:KMV_K]
        merged.setdefault(et, set()).update(kept)
        n_days.setdefault(et, set()).add(d)
    rows = []
    for et in sorted(merged):
        kept = sorted(merged[et])[:KMV_K]
        rows.append((et, len(n_days[et]), _kmv_est(len(kept), kept[-1])))
    return pd.DataFrame(
        rows, columns=["event_type", "n_days", "est_users"]
    )


@replay("q_bigram_bits")
def r_bigram_bits(t: Tables) -> pd.DataFrame:
    """Corpus bigram conditional cross-entropy per doc, plain
    Counters. Pairs are adjacent in the RAW split (an empty token
    breaks adjacency), matching the declared tokenization."""
    from collections import Counter

    docs = t.documents
    doc_pairs: dict[int, list] = {}
    big: Counter = Counter()
    ctx: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        raw = text.split(" ")
        ps = [
            (raw[i], raw[i + 1])
            for i in range(len(raw) - 1)
            if raw[i] != "" and raw[i + 1] != ""
        ]
        if ps:
            doc_pairs[int(doc_id)] = ps
            big.update(ps)
            ctx.update(p[0] for p in ps)
    rows = []
    for doc_id in sorted(doc_pairs):
        ps = doc_pairs[doc_id]
        bits = [-math.log2(big[p] / ctx[p[0]]) for p in ps]
        rows.append(
            (doc_id, len(ps), _spark_round(sum(bits) / len(bits), 4))
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bigrams", "bits_per_bigram"]
    )


PMI_VOCAB = 40  # queries/text.py q_pmi_pairs vocab_size=40
PMI_MIN_DOCS = 5  # queries/text.py q_pmi_pairs min_pair_docs=5


@replay("q_pmi_pairs")
def r_pmi_pairs(t: Tables) -> pd.DataFrame:
    """Document-level PMI over the top-40 vocab, plain sets."""
    from collections import Counter
    from itertools import combinations

    doc_toks = [
        set(_tokens(text)) for text in t.documents["text"]
    ]
    n_docs = len(t.documents)
    df: Counter = Counter()
    for s in doc_toks:
        df.update(s)
    vocab = dict(
        sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:PMI_VOCAB]
    )
    both: Counter = Counter()
    for s in doc_toks:
        present = sorted(s & vocab.keys())
        for a, b in combinations(present, 2):
            both[(a, b)] += 1
    rows = []
    for (a, b), n_both in sorted(both.items()):
        if n_both < PMI_MIN_DOCS:
            continue
        pmi = _spark_round(
            math.log2((n_both * n_docs) / (vocab[a] * vocab[b])), 4
        )
        rows.append((a, b, vocab[a], vocab[b], n_both, pmi))
    return pd.DataFrame(
        rows,
        columns=[
            "tok_a",
            "tok_b",
            "n_docs_a",
            "n_docs_b",
            "n_docs_both",
            "pmi_bits",
        ],
    )


WSAMPLE_K = 10  # queries/text.py WSAMPLE_K


def _quality_score_py(text: str) -> float:
    """operators/text.py quality_score re-derived: stable 4-decimal
    round of the clamped stopword/diversity/digit composite."""
    n_chars = len(text)
    raw = text.split(" ")
    toks = [x for x in raw if x != ""]
    n_tok = len(toks)
    n_digit = sum(ch.isdigit() for ch in text)
    markers = LANG_MARKERS["en"]
    n_stop = sum(1 for x in raw if x in markers)
    n_distinct = len(set(raw))
    v = min(
        1.0,
        max(
            0.0,
            0.5 * (n_stop / n_tok)
            + 0.5 * (n_distinct / n_tok)
            - n_digit / n_chars,
        ),
    )
    return _spark_round(v, 4)


@replay("q_weighted_sample")
def r_weighted_sample(t: Tables) -> pd.DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling with the portable
    content-hash uniform, plain Python."""
    keyed = []
    for doc_id, lang, text in zip(
        t.documents["doc_id"], t.documents["lang"], t.documents["text"]
    ):
        w = _quality_score_py(text) + 0.05
        u = (_portable_hash(text, "wsample") % (1 << 20) + 0.5) / float(
            1 << 20
        )
        keyed.append(
            (int(doc_id), str(lang), _spark_round(u ** (1.0 / w), 6))
        )
    rows = []
    by_lang: dict[str, list] = {}
    for doc_id, lang, k in keyed:
        by_lang.setdefault(lang, []).append((doc_id, k))
    for lang in sorted(by_lang):
        ranked = sorted(by_lang[lang], key=lambda dk: (-dk[1], dk[0]))
        for r, (doc_id, k) in enumerate(ranked[:WSAMPLE_K], start=1):
            rows.append((doc_id, lang, k, r))
    return pd.DataFrame(
        rows, columns=["doc_id", "lang", "es_key", "sample_rank"]
    )


# ---------------------------------------------------------------------------
# wave 9: hash/LSH dedup detectors, suffix-array dedup, EM record
# linkage — the engine and oracle share the banding/DP expressions;
# these replays rebuild each detector from its published definition
# with inverted indexes, Python sorts and sequential EM.
# ---------------------------------------------------------------------------

JACCARD_N = 5  # queries/dedup.py JACCARD_N
JACCARD_T = 0.2  # queries/dedup.py JACCARD_T
JACCARD_DF_CAP = 1000  # queries/dedup.py JACCARD_DF_CAP
CONTAIN_N = 5  # queries/dedup.py CONTAIN_N
CONTAIN_T = 0.3  # queries/dedup.py CONTAIN_T
SIMHASH_MAXH = 3  # queries/dedup.py SIMHASH_MAXH


def _distinct_shingle_sets(
    t: Tables, n: int, df_cap: int | None = None
) -> dict[int, set]:
    """Distinct word-n-gram set per doc over the RAW split, optional
    document-frequency cap on hot shingles."""
    from collections import Counter

    sets = {
        int(doc_id): set(_shingles(text, n))
        for doc_id, text in zip(t.documents["doc_id"], t.documents["text"])
    }
    if df_cap is not None:
        df: Counter = Counter()
        for s in sets.values():
            df.update(s)
        hot = {sh for sh, c in df.items() if c > df_cap}
        if hot:
            sets = {d: s - hot for d, s in sets.items()}
    return sets


def _pairs_common(sets: dict[int, set]) -> dict[tuple[int, int], int]:
    """|A ∩ B| for every doc pair sharing >= 1 shingle, via an
    inverted index (never all-pairs)."""
    from collections import Counter

    inv: dict[str, list[int]] = {}
    for d in sorted(sets):
        for sh in sets[d]:
            inv.setdefault(sh, []).append(d)
    common: Counter = Counter()
    for docs in inv.values():
        for i in range(len(docs) - 1):
            for j in range(i + 1, len(docs)):
                common[(docs[i], docs[j])] += 1
    return common


@replay("q_dedup_ngram_jaccard")
def r_dedup_ngram_jaccard(t: Tables) -> pd.DataFrame:
    sets = _distinct_shingle_sets(t, JACCARD_N, JACCARD_DF_CAP)
    rows = []
    for (a, b), c in sorted(_pairs_common(sets).items()):
        jac = _spark_round(c / (len(sets[a]) + len(sets[b]) - c), 4)
        if jac >= JACCARD_T:
            rows.append((a, b, c, jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "common", "jaccard"])


@replay("q_containment_pairs")
def r_containment_pairs(t: Tables) -> pd.DataFrame:
    sets = _distinct_shingle_sets(t, CONTAIN_N, JACCARD_DF_CAP)
    rows = []
    for (a, b), c in sorted(_pairs_common(sets).items()):
        ca = _spark_round(c / len(sets[a]), 4)
        cb = _spark_round(c / len(sets[b]), 4)
        if max(ca, cb) >= CONTAIN_T:
            rows.append((a, b, c, ca, cb))
    return pd.DataFrame(
        rows,
        columns=["doc_a", "doc_b", "common", "cont_a_in_b", "cont_b_in_a"],
    )


def _simhash_fp(text: str) -> int | None:
    """48-bit SimHash (Charikar 2002): per-token tf-weighted bit
    votes over the portable 60-bit token hash."""
    from collections import Counter

    tf = Counter(tok for tok in text.split(" ") if tok != "")
    if not tf:
        return None
    votes = [0] * SIMHASH_BITS
    for tok, c in tf.items():
        h = _portable_hash(tok)
        for b in range(SIMHASH_BITS):
            votes[b] += c if (h >> b) & 1 else -c
    fp = 0
    for b in range(SIMHASH_BITS):
        if votes[b] >= 0:
            fp |= 1 << b
    return fp


def _simhash_band_pairs(t: Tables) -> list[tuple[int, int, int]]:
    """(doc_a, doc_b, hamming) for every byte-band collision pair
    within the SIMHASH_MAXH radius."""
    fps = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        fp = _simhash_fp(text)
        if fp is not None:
            fps[int(doc_id)] = fp
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in sorted(fps):
        for i in range(SIMHASH_BITS // 8):
            buckets.setdefault(
                (i, (fps[d] >> (8 * i)) & 255), []
            ).append(d)
    seen: set[tuple[int, int]] = set()
    out = []
    for docs in buckets.values():
        for i in range(len(docs) - 1):
            for j in range(i + 1, len(docs)):
                p = (docs[i], docs[j])
                if p in seen:
                    continue
                seen.add(p)
                ham = bin(fps[p[0]] ^ fps[p[1]]).count("1")
                if ham <= SIMHASH_MAXH:
                    out.append((p[0], p[1], ham))
    return out


@replay("q_dedup_simhash_pairs")
def r_dedup_simhash_pairs(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        sorted(_simhash_band_pairs(t)),
        columns=["doc_a", "doc_b", "hamming"],
    )


@replay("q_simhash_quality_sweep")
def r_simhash_quality_sweep(t: Tables) -> pd.DataFrame:
    pairs = _simhash_band_pairs(t)
    sets = _distinct_shingle_sets(t, MINHASH_N)
    scored = []
    for a, b, ham in pairs:
        c = len(sets[a] & sets[b])
        scored.append(
            (ham, _spark_round(c / (len(sets[a]) + len(sets[b]) - c), 4))
        )
    rows = []
    for max_h in range(SIMHASH_MAXH + 1):
        sel = [j for h, j in scored if h <= max_h]
        if not sel:
            continue
        rows.append(
            (
                max_h,
                len(sel),
                _spark_round(math.fsum(sel) / len(sel), 4),
                sum(1 for j in sel if j >= 0.5),
            )
        )
    return pd.DataFrame(
        rows, columns=["max_h", "n_pairs", "mean_jaccard", "n_ge_05"]
    )


@replay("q_minhash_precision")
def r_minhash_precision(t: Tables) -> pd.DataFrame:
    """Every banded MinHash candidate's estimated vs EXACT Jaccard."""
    pairs = _minhash_pairs_replay(t)
    sets = _distinct_shingle_sets(t, MINHASH_N)
    rows = []
    for a, b, est in pairs:
        c = len(sets[a] & sets[b])
        exact = _spark_round(c / (len(sets[a]) + len(sets[b]) - c), 4)
        rows.append((a, b, est, exact, _spark_round(abs(est - exact), 4)))
    return pd.DataFrame(
        rows,
        columns=["doc_a", "doc_b", "est_jaccard", "exact_jaccard", "abs_err"],
    )


@replay("q_incremental_dedup")
def r_incremental_dedup(t: Tables) -> pd.DataFrame:
    """Batch-vs-corpus admission re-run with plain sets: exact fp
    stage, then MinHash banded near-dup vs corpus and within batch
    (>= 8/16 matching minhashes)."""
    import hashlib

    docs = t.documents
    split = int(docs["doc_id"].max()) * 7 // 10
    corpus = [
        (int(d), txt)
        for d, txt in zip(docs["doc_id"], docs["text"])
        if int(d) < split
    ]
    batch = sorted(
        (int(d), txt)
        for d, txt in zip(docs["doc_id"], docs["text"])
        if int(d) >= split
    )
    corpus_fps = {hashlib.md5(txt.encode()).hexdigest() for _, txt in corpus}
    first_seen: dict[str, int] = {}
    verdicts: dict[int, str] = {}
    fps: dict[int, str] = {}
    e_docs = []
    for d, txt in batch:
        fp = hashlib.md5(txt.encode()).hexdigest()
        fps[d] = fp
        if fp in corpus_fps:
            verdicts[d] = "exact_corpus"
        elif fp in first_seen:
            verdicts[d] = "exact_batch"
        else:
            first_seen[fp] = d
            e_docs.append((d, txt))
    min_match = int(math.ceil(MINHASH_T * MINHASH_K))  # >= t ⇔ >= 8/16
    r = MINHASH_K // MINHASH_BANDS
    c_sigs, c_bands = {}, {}
    for d, txt in corpus:
        s = _minhash_sig(txt, MINHASH_K, MINHASH_N)
        if s is None:
            continue
        c_sigs[d] = s
        for bi in range(MINHASH_BANDS):
            c_bands.setdefault(
                (bi, tuple(s[bi * r : (bi + 1) * r])), []
            ).append(d)
    e_sigs, e_bands = {}, {}
    for d, txt in e_docs:
        s = _minhash_sig(txt, MINHASH_K, MINHASH_N)
        if s is None:
            continue
        e_sigs[d] = s
        for bi in range(MINHASH_BANDS):
            e_bands.setdefault(
                (bi, tuple(s[bi * r : (bi + 1) * r])), []
            ).append(d)
    near_corpus: set[int] = set()
    near_batch: set[int] = set()
    for key, eds in e_bands.items():
        for ed in eds:
            for cd in c_bands.get(key, []):
                if (
                    sum(
                        x == y
                        for x, y in zip(e_sigs[ed], c_sigs[cd])
                    )
                    >= min_match
                ):
                    near_corpus.add(ed)
                    break
        for i in range(len(eds) - 1):
            for j in range(i + 1, len(eds)):
                a, b = min(eds[i], eds[j]), max(eds[i], eds[j])
                if (
                    sum(x == y for x, y in zip(e_sigs[a], e_sigs[b]))
                    >= min_match
                ):
                    near_batch.add(b)
    for d, _ in e_docs:
        if d in near_corpus:
            verdicts[d] = "near_corpus"
        elif d in near_batch:
            verdicts[d] = "near_batch"
        else:
            verdicts[d] = "admitted"
    return pd.DataFrame(
        [(d, fps[d], verdicts[d]) for d, _ in batch],
        columns=["doc_id", "fp", "verdict"],
    )


SUFFIX_DOC_MOD = 5  # queries/dedup.py SUFFIX_DOC_MOD
SUFFIX_MAX_LEN = 128  # queries/dedup.py SUFFIX_MAX_LEN
SUFFIX_MIN_LCP = 20  # queries/dedup.py SUFFIX_MIN_LCP
SUFFIX_TOP_K = 50  # queries/dedup.py SUFFIX_TOP_K


def _suffix_adjacent_pairs(t: Tables) -> list[tuple]:
    """(sa_rank, doc, pos, next_doc, next_pos, lcp) for adjacent
    suffixes in the true lexicographic order — a direct Python sort of
    the suffix strings (the engine builds the order by Manber-Myers
    prefix doubling)."""
    sufs = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        if int(doc_id) % SUFFIX_DOC_MOD != 0:
            continue
        tt = text[:SUFFIX_MAX_LEN]
        for p in range(len(tt)):
            sufs.append((tt[p:], int(doc_id), p))
    sufs.sort()
    out = []
    for r in range(len(sufs) - 1):
        a, b = sufs[r], sufs[r + 1]
        lcp = 0
        mx = min(len(a[0]), len(b[0]))
        while lcp < mx and a[0][lcp] == b[0][lcp]:
            lcp += 1
        out.append((r + 1, a[1], a[2], b[1], b[2], lcp))
    return out


@replay("q_suffix_repeats")
def r_suffix_repeats(t: Tables) -> pd.DataFrame:
    pairs = [p for p in _suffix_adjacent_pairs(t) if p[5] >= SUFFIX_MIN_LCP]
    pairs.sort(key=lambda p: (-p[5], p[0]))
    return pd.DataFrame(
        pairs[:SUFFIX_TOP_K],
        columns=["sa_rank", "doc_id", "pos", "next_doc", "next_pos", "lcp"],
    )


@replay("q_suffix_dedup_spans")
def r_suffix_dedup_spans(t: Tables) -> pd.DataFrame:
    ivals: set = set()
    for _, d, p, nd, np_, lcp in _suffix_adjacent_pairs(t):
        if lcp < SUFFIX_MIN_LCP:
            continue
        ivals.add((d, p, p + lcp))
        ivals.add((nd, np_, np_ + lcp))
    by_doc: dict[int, list] = {}
    for d, s, e in sorted(ivals):
        by_doc.setdefault(d, []).append((s, e))
    rows = []
    for d in sorted(by_doc):
        cur_s, cur_e = None, None
        for s, e in by_doc[d]:  # sorted (s, e); merge when s <= max_e
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    rows.append((d, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        rows.append((d, cur_s, cur_e, cur_e - cur_s))
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end", "span_len"]
    )


FS_ITERS = 5  # queries/dedup.py FS_ITERS
FS_INIT = (0.25, 0.8, 0.3)  # queries/dedup.py FS_INIT


@replay("q_fellegi_sunter")
def r_fellegi_sunter(t: Tables) -> pd.DataFrame:
    """Fellegi-Sunter EM on the 8-row agreement-pattern frame, plain
    sequential Python (pattern sums folded in pid order)."""
    from collections import Counter

    c = t.customer
    recs = []
    for nk, seg, bal in zip(
        c["c_nationkey"], c["c_mktsegment"], c["c_acctbal"]
    ):
        cents = int(_spark_round(float(bal) * 100, 0))
        recs.append((int(nk), str(seg), cents, math.floor(cents / 100000.0)))
    by_nation: dict[int, list] = {}
    order = sorted(range(len(recs)), key=lambda i: int(c["c_custkey"].iloc[i]))
    for i in order:
        by_nation.setdefault(recs[i][0], []).append(recs[i])
    pat: Counter = Counter()
    for rs in by_nation.values():
        for i in range(len(rs) - 1):
            for j in range(i + 1, len(rs)):
                a1 = 1 if rs[i][1] == rs[j][1] else 0
                a2 = 1 if rs[i][3] == rs[j][3] else 0
                a3 = 1 if abs(rs[i][2] - rs[j][2]) <= 10000 else 0
                pat[(a1, a2, a3)] += 1
    pats = sorted(
        ((a1 * 4 + a2 * 2 + a3, a1, a2, a3, n) for (a1, a2, a3), n in pat.items())
    )
    nn = sum(p[4] for p in pats)
    ag = [sum(p[4] * p[1 + j] for p in pats) for j in range(3)]
    lam, m, u = FS_INIT[0], [FS_INIT[1]] * 3, [FS_INIT[2]] * 3

    def prod(ps, pattern):
        out = 1.0
        for j in range(3):
            out *= ps[j] if pattern[j] == 1 else 1.0 - ps[j]
        return out

    for _ in range(FS_ITERS):
        sg, sga = 0.0, [0.0, 0.0, 0.0]
        for pid, a1, a2, a3, n in pats:  # pid-ordered sequential fold
            pm, pu = prod(m, (a1, a2, a3)), prod(u, (a1, a2, a3))
            g = (lam * pm) / (lam * pm + (1.0 - lam) * pu)
            sg += n * g
            for j, aj in enumerate((a1, a2, a3)):
                sga[j] += (n * g) * aj
        lam = sg / nn
        m = [sga[j] / sg for j in range(3)]
        u = [(ag[j] - sga[j]) / (nn - sg) for j in range(3)]
    rows = []
    for pid, a1, a2, a3, n in pats:
        pm, pu = prod(m, (a1, a2, a3)), prod(u, (a1, a2, a3))
        post = (lam * pm) / (lam * pm + (1.0 - lam) * pu)
        rows.append(
            (
                pid,
                a1,
                a2,
                a3,
                n,
                _spark_round(post, 6),
                _spark_round(math.log(pm / pu), 6),
                _spark_round(lam, 6),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "pid",
            "a1",
            "a2",
            "a3",
            "n_pairs",
            "posterior_match",
            "match_weight",
            "lambda_est",
        ],
    )


@replay("q_similarity_lsh_topk")
def r_similarity_lsh_topk(t: Tables) -> pd.DataFrame:
    """LSH bucket-restricted top-k: same-bucket candidates, exact
    cosine re-rank, plain Python."""
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    by_bucket: dict[int, list[int]] = {}
    for idx, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(idx)
    rows = []
    for qi in range(len(ids)):
        if int(ids[qi]) % QUERY_MOD != 0:
            continue
        cand = [ci for ci in by_bucket.get(int(buckets[qi]), []) if ci != qi]
        if not cand:
            continue
        cos6 = _rounded_cos(m[qi], m[cand])
        ranked = sorted(
            zip(cos6, (int(ids[ci]) for ci in cand)),
            key=lambda rc: (-rc[0], rc[1]),
        )[:TOPK]
        for r, (c6, cid) in enumerate(ranked, start=1):
            rows.append((int(ids[qi]), r, cid, _spark_round(c6, 4)))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "cand_id", "cos_sim"]
    )


@replay("q_similarity_near_dup_lsh")
def r_similarity_near_dup_lsh(t: Tables) -> pd.DataFrame:
    """SRP-bucket-blocked near-dup pairs >= NEAR_T, plain Python."""
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    by_bucket: dict[int, list[int]] = {}
    for idx, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(idx)
    rows = []
    for members in by_bucket.values():
        for i in range(len(members) - 1):
            ai = members[i]
            cand = members[i + 1 :]
            cos4 = _rounded_cos(m[ai], m[cand], 4)
            for cj, c4 in zip(cand, cos4):
                a, b = int(ids[ai]), int(ids[cj])
                if a > b:
                    a, b = b, a
                if c4 >= NEAR_T:
                    rows.append((a, b, c4))
    return pd.DataFrame(
        sorted(rows), columns=["id_a", "id_b", "cos_sim"]
    )


# ---------------------------------------------------------------------------
# wave 10: curation-funnel mechanics — packing, quotas, budgets,
# mixtures, deterministic sampling, contrastive triplet assembly.
# Plain sequential Python over sorted lists.
# ---------------------------------------------------------------------------

STRATA_FRAC = 0.2  # queries/text.py STRATA_FRAC
PACK_BUDGET = 256  # queries/text.py PACK_BUDGET
SOURCE_QUOTA = 15  # queries/text.py SOURCE_QUOTA
TOKEN_BUDGET = 2000  # queries/text.py TOKEN_BUDGET
MIX_ALPHA = 0.7  # queries/text.py MIX_ALPHA
MIX_SAMPLE_N = 200  # queries/text.py MIX_SAMPLE_N
NEG_K = 4  # queries/layout.py NEG_K
HARD_CEIL = 0.35  # queries/similarity.py HARD_CEIL (= NEAR_T)


@replay("q_stratified_sample")
def r_stratified_sample(t: Tables) -> pd.DataFrame:
    from collections import Counter

    c: Counter = Counter()
    cut = int(STRATA_FRAC * 10_000)
    for lang, text in zip(t.documents["lang"], t.documents["text"]):
        if _portable_hash(text, "sample") % 10_000 < cut:
            c[str(lang)] += 1
    return pd.DataFrame(
        sorted(c.items()), columns=["lang", "sampled"]
    )


def _pack_bins(t: Tables) -> dict[tuple[str, int], list[tuple[int, str, int]]]:
    """(lang, bin_id) -> [(doc_id, text, n_tokens)] by the cumulative
    first-fit cut in doc_id order."""
    by_lang: dict[str, list] = {}
    for doc_id, lang, text in zip(
        t.documents["doc_id"], t.documents["lang"], t.documents["text"]
    ):
        ntok = 0 if text == "" else len(_tokens(text))
        by_lang.setdefault(str(lang), []).append((int(doc_id), text, ntok))
    bins: dict[tuple[str, int], list] = {}
    for lang in by_lang:
        cum = 0
        for doc_id, text, ntok in sorted(by_lang[lang]):
            bin_id = cum // PACK_BUDGET  # floor((cumsum - n)/budget)
            bins.setdefault((lang, bin_id), []).append((doc_id, text, ntok))
            cum += ntok
    return bins


@replay("q_pack_sequences")
def r_pack_sequences(t: Tables) -> pd.DataFrame:
    rows = [
        (lang, bin_id, len(docs), sum(d[2] for d in docs))
        for (lang, bin_id), docs in sorted(_pack_bins(t).items())
    ]
    return pd.DataFrame(
        rows, columns=["lang", "bin_id", "n_docs", "bin_tokens"]
    )


@replay("q_pack_manifest")
def r_pack_manifest(t: Tables) -> pd.DataFrame:
    import hashlib

    rows = []
    for (lang, bin_id), docs in sorted(_pack_bins(t).items()):
        packed = "\n\n".join(d[1] for d in sorted(docs))
        rows.append(
            (
                lang,
                bin_id,
                len(docs),
                sum(d[2] for d in docs),
                hashlib.md5(packed.encode()).hexdigest(),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["lang", "bin_id", "n_docs", "bin_tokens", "pack_md5"],
    )


@replay("q_pack_efficiency")
def r_pack_efficiency(t: Tables) -> pd.DataFrame:
    per_lang: dict[str, list[int]] = {}
    for (lang, _), docs in _pack_bins(t).items():
        per_lang.setdefault(lang, []).append(sum(d[2] for d in docs))
    rows = []
    for lang in sorted(per_lang):
        fills = per_lang[lang]
        rows.append(
            (
                lang,
                len(fills),
                _spark_round(
                    math.fsum(b / PACK_BUDGET for b in fills) / len(fills), 4
                ),
                sum(1 for b in fills if b < 0.8 * PACK_BUDGET),
            )
        )
    return pd.DataFrame(
        rows, columns=["lang", "n_bins", "avg_fill", "underfilled_bins"]
    )


@replay("q_mixture_sample")
def r_mixture_sample(t: Tables) -> pd.DataFrame:
    by_lang: dict[str, list] = {}
    for doc_id, lang in zip(t.documents["doc_id"], t.documents["lang"]):
        d = int(doc_id)
        by_lang.setdefault(str(lang), []).append(
            (_portable_hash(str(d)), d)
        )
    min_n = min(len(v) for v in by_lang.values())
    rows = []
    for lang in sorted(by_lang):
        for _, d in sorted(by_lang[lang])[:min_n]:
            rows.append((d, lang))
    return pd.DataFrame(sorted(rows), columns=["doc_id", "lang"])


@replay("q_source_quota")
def r_source_quota(t: Tables) -> pd.DataFrame:
    by_src: dict[str, list] = {}
    for doc_id, src, text in zip(
        t.documents["doc_id"], t.documents["source"], t.documents["text"]
    ):
        by_src.setdefault(str(src), []).append(
            (_portable_hash(text, "quota"), int(doc_id))
        )
    rows = []
    for src in sorted(by_src):
        for r, (_, d) in enumerate(sorted(by_src[src])[:SOURCE_QUOTA], 1):
            rows.append((d, src, r))
    return pd.DataFrame(
        sorted(rows), columns=["doc_id", "source", "quota_rank"]
    )


@replay("q_budget_select")
def r_budget_select(t: Tables) -> pd.DataFrame:
    by_lang: dict[str, list] = {}
    for doc_id, lang, text in zip(
        t.documents["doc_id"], t.documents["lang"], t.documents["text"]
    ):
        ntok = 0 if text == "" else len(_tokens(text))
        by_lang.setdefault(str(lang), []).append(
            (int(doc_id), _quality_score_py(text), ntok)
        )
    rows = []
    for lang in sorted(by_lang):
        cum = 0
        for d, score, ntok in sorted(
            by_lang[lang], key=lambda r: (-r[1], r[0])
        ):
            cum += ntok
            if cum > TOKEN_BUDGET:
                break
            rows.append((d, lang, score, cum))
    return pd.DataFrame(
        rows, columns=["doc_id", "lang", "score", "cum_tokens"]
    )


@replay("q_temperature_mixture")
def r_temperature_mixture(t: Tables) -> pd.DataFrame:
    from collections import Counter

    counts = Counter(str(x) for x in t.documents["lang"])
    total = sum(counts.values())
    w = {
        lang: _spark_round((n / total) ** MIX_ALPHA, 6)
        for lang, n in counts.items()
    }
    ws = math.fsum(w.values())
    rows = []
    for lang in sorted(counts):
        frac = _spark_round(w[lang] / ws, 6)
        rows.append(
            (lang, counts[lang], frac, int(math.floor(frac * MIX_SAMPLE_N)))
        )
    return pd.DataFrame(
        rows, columns=["lang", "n_docs", "sampled_frac", "target_docs"]
    )


@replay("q_dataset_card")
def r_dataset_card(t: Tables) -> pd.DataFrame:
    import hashlib

    d = t.documents
    scores = [_quality_score_py(x) for x in d["text"]]
    ntoks = np.array(
        [0 if x == "" else len(_tokens(x)) for x in d["text"]],
        dtype=np.int64,
    )
    n_docs = len(d)
    n_fp = len({hashlib.md5(x.encode()).hexdigest() for x in d["text"]})
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_sources": [d["source"].nunique()],
            "n_langs": [d["lang"].nunique()],
            "dup_rate": [_spark_round(1.0 - n_fp / n_docs, 6)],
            "mean_quality": [_spark_round(math.fsum(scores) / n_docs, 4)],
            "p50_tokens": [
                _spark_round(float(np.percentile(ntoks, 50)), 4)
            ],
            "p95_tokens": [
                _spark_round(float(np.percentile(ntoks, 95)), 4)
            ],
            "total_tokens": [int(ntoks.sum())],
        }
    )


def _hash_ring(ids: list[int]) -> list[int]:
    """ids ordered by (md5 hexdigest string, id) — the declared ring."""
    import hashlib

    return [
        i
        for _, i in sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
        )
    ]


@replay("q_negative_samples")
def r_negative_samples(t: Tables) -> pd.DataFrame:
    ring = _hash_ring([int(x) for x in t.documents["doc_id"]])
    n = len(ring)
    step = n // (NEG_K + 1)
    rows = []
    for r, anchor in enumerate(ring):
        for j in range(1, NEG_K + 1):
            neg = ring[(r + j * step) % n]
            if neg != anchor:
                rows.append((anchor, j, neg))
    return pd.DataFrame(
        sorted(rows), columns=["anchor_id", "neg_idx", "negative_id"]
    )


@replay("q_hard_negatives")
def r_hard_negatives(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    rows = []
    for qi in range(len(ids)):
        if int(ids[qi]) % QUERY_MOD != 0:
            continue
        cand = [ci for ci in range(len(ids)) if ci != qi]
        cos6 = _rounded_cos(m[qi], m[cand])
        below = [
            (c6, int(ids[ci]))
            for c6, ci in zip(cos6, cand)
            if c6 < HARD_CEIL
        ]
        ranked = sorted(below, key=lambda rc: (-rc[0], rc[1]))[:TOPK]
        for r, (c6, cid) in enumerate(ranked, start=1):
            rows.append((int(ids[qi]), r, cid, _spark_round(c6, 4)))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "cand_id", "cos_sim"]
    )


@replay("q_training_triplets")
def r_training_triplets(t: Tables) -> pd.DataFrame:
    e = t.embeddings.sort_values("vec_id")
    ids = [int(x) for x in e["vec_id"]]
    m = np.stack([np.asarray(v, np.float64) for v in e["embedding"]])
    labels = [int(x) for x in e["label"]]
    by_label: dict[int, list[int]] = {}
    for idx, lab in enumerate(labels):
        by_label.setdefault(lab, []).append(idx)
    pos = []
    for members in by_label.values():
        for i in range(len(members) - 1):
            ai = members[i]
            cand = members[i + 1 :]
            cos4 = _rounded_cos(m[ai], m[cand], 4)
            for cj, c4 in zip(cand, cos4):
                if c4 >= NEAR_T:
                    pos.append((ids[ai], ids[cj], c4))
    ring = _hash_ring(ids)
    n = len(ring)
    step = n // 2
    neg = {}
    for r, anchor in enumerate(ring):
        cand = ring[(r + step) % n]
        if cand != anchor:
            neg[anchor] = cand
    rows = [
        (a, p, neg[a], c4) for a, p, c4 in pos if a in neg
    ]
    return pd.DataFrame(
        sorted(rows),
        columns=["anchor_id", "positive_id", "negative_id", "pos_sim"],
    )


# ---------------------------------------------------------------------------
# wave 11: curation dedup surfaces (survivors, normalization,
# decontamination, passages, anchored spans), text-feature QA, URL
# canonicalization, positional/inverted indexes, event trigrams.
# ---------------------------------------------------------------------------

EVAL_MOD = 97  # queries/dedup.py EVAL_MOD
DECONTAM_N = 5  # queries/dedup.py DECONTAM_N
NGRAM_N = 2  # queries/text.py NGRAM_N
NGRAM_TOP = 20  # queries/text.py NGRAM_TOP
SWEEP_THRESHOLDS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)  # queries/text.py
INDEX_TOP_TOKENS = 25  # queries/text.py INDEX_TOP_TOKENS
PHRASE = ("table", "hash")  # queries/text.py PHRASE


@replay("q_dedup_survivors")
def r_dedup_survivors(t: Tables) -> pd.DataFrame:
    comp = _components([(a, b) for a, b, _ in _minhash_pairs_replay(t)])
    sizes: dict[int, int] = {}
    for _, rep in comp.items():
        sizes[rep] = sizes.get(rep, 0) + 1
    rows = []
    for doc_id in t.documents["doc_id"].astype(int):
        rep = comp.get(doc_id)
        if rep is not None and rep != doc_id:
            continue  # non-canonical cluster member dropped
        rows.append((doc_id, sizes.get(doc_id, 1)))
    return pd.DataFrame(sorted(rows), columns=["doc_id", "cluster_size"])


@replay("q_dedup_normalized")
def r_dedup_normalized(t: Tables) -> pd.DataFrame:
    import hashlib
    import re

    agg: dict[str, list[int]] = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        norm = re.sub(r"[ \t\n\r\f\v]+", " ", text.lower()).strip()
        fp = hashlib.md5(norm.encode()).hexdigest()
        row = agg.setdefault(fp, [int(doc_id), 0])
        row[0] = min(row[0], int(doc_id))
        row[1] += 1
    return pd.DataFrame(
        sorted((fp, k, c) for fp, (k, c) in agg.items()),
        columns=["norm_fp", "keep_id", "dup_cnt"],
    )


@replay("q_decontam")
def r_decontam(t: Tables) -> pd.DataFrame:
    ev_docs: dict[int, set] = {}
    co_docs: dict[int, set] = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        d = int(doc_id)
        sh = set(_shingles(text, DECONTAM_N))
        (ev_docs if d % EVAL_MOD == 0 else co_docs)[d] = sh
    inv: dict[str, list[int]] = {}
    for ed, sh in ev_docs.items():
        for s in sh:
            inv.setdefault(s, []).append(ed)
    rows = []
    for cd in sorted(co_docs):
        shared = {s for s in co_docs[cd] if s in inv}
        if not shared:
            continue
        evs = {ed for s in shared for ed in inv[s]}
        rows.append((cd, len(shared), len(evs)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_shared_shingles", "n_eval_docs"]
    )


@replay("q_passage_dedup")
def r_passage_dedup(t: Tables) -> pd.DataFrame:
    import hashlib

    agg: dict[str, list] = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        if not toks:
            continue
        d = int(doc_id)
        for i in range(0, len(toks), PASSAGE_W):
            fp = hashlib.md5(
                " ".join(toks[i : i + PASSAGE_W]).encode()
            ).hexdigest()
            row = agg.setdefault(fp, [0, set(), d])
            row[0] += 1
            row[1].add(d)
            row[2] = min(row[2], d)
    rows = [
        (fp, n, len(docs), keep)
        for fp, (n, docs, keep) in sorted(agg.items())
        if n > 1
    ]
    return pd.DataFrame(
        rows, columns=["passage_fp", "n_copies", "n_docs", "keep_doc"]
    )


ANCHOR_GRAM = 32  # operators/dedup.py duplicated_substring_spans gram_len
ANCHOR_MOD = 4  # queries/dedup.py q_anchored_dup_spans anchor_mod


@replay("q_anchored_dup_spans")
def r_anchored_dup_spans(t: Tables) -> pd.DataFrame:
    """Content-defined anchored duplicate spans: hash every 32-gram,
    keep hash % 4 == 0 anchors, flag anchors whose gram repeats
    anywhere, merge per-doc anchors <= 32 apart into spans."""
    from collections import Counter

    positions: dict[int, list[tuple[int, int]]] = {}
    counts: Counter = Counter()
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        if len(text) < ANCHOR_GRAM:
            continue
        d = int(doc_id)
        for p in range(1, len(text) - ANCHOR_GRAM + 2):  # 1-based
            gk = _portable_hash(text[p - 1 : p - 1 + ANCHOR_GRAM])
            if gk % ANCHOR_MOD == 0:
                positions.setdefault(d, []).append((p, gk))
                counts[gk] += 1
    rows = []
    for d in sorted(positions):
        dup_pos = sorted(p for p, gk in positions[d] if counts[gk] >= 2)
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev <= ANCHOR_GRAM:
                prev = p
            else:
                rows.append(
                    (d, start, prev + 31, prev + 31 - start + 1)
                )
                start = prev = p
        rows.append((d, start, prev + 31, prev + 31 - start + 1))
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end", "span_len"]
    )


@replay("q_text_quality")
def r_text_quality(t: Tables) -> pd.DataFrame:
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        n_chars = len(text)
        raw = text.split(" ")
        toks = [x for x in raw if x != ""]
        n_tok = len(toks)
        n_space = text.count(" ")
        n_punct = sum(ch in ".,!?;:" for ch in text)
        n_digit = sum(ch.isdigit() for ch in text)
        n_stop = sum(1 for x in raw if x in LANG_MARKERS["en"])
        n_distinct = len(set(raw))
        q = min(
            1.0,
            max(
                0.0,
                0.5 * (n_stop / n_tok)
                + 0.5 * (n_distinct / n_tok)
                - n_digit / n_chars,
            ),
        )
        rows.append(
            (
                int(doc_id),
                n_chars,
                n_tok,
                _spark_round((n_chars - n_space) / n_tok, 4),
                _spark_round(n_punct / n_chars, 4),
                _spark_round(n_digit / n_chars, 4),
                _spark_round(n_stop / n_tok, 4),
                _spark_round(n_distinct / n_tok, 4),
                _spark_round(q, 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id",
            "n_chars",
            "n_tokens",
            "avg_token_len",
            "punct_ratio",
            "digit_ratio",
            "stopword_ratio",
            "distinct_ratio",
            "quality_score",
        ],
    )


@replay("q_ngram_freq")
def r_ngram_freq(t: Tables) -> pd.DataFrame:
    from collections import Counter

    occ: Counter = Counter()
    df: Counter = Counter()
    for text in t.documents["text"]:
        sh = _shingles(text, NGRAM_N)
        occ.update(sh)
        df.update(set(sh))
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:NGRAM_TOP]
    return pd.DataFrame(
        [(s, c, df[s]) for s, c in top],
        columns=["shingle", "occurrences", "doc_freq"],
    )


@replay("q_repetition")
def r_repetition(t: Tables) -> pd.DataFrame:
    from collections import Counter

    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        n, nd = len(toks), len(set(toks))
        if n > 0:
            top = Counter(toks).most_common(1)[0][1]
            rows.append(
                (
                    int(doc_id),
                    n,
                    nd,
                    _spark_round(1.0 - nd / n, 4),
                    _spark_round(top / n, 4),
                )
            )
        else:
            rows.append((int(doc_id), 0, 0, None, None))
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id",
            "n_tokens",
            "n_distinct",
            "dup_ratio",
            "top_token_ratio",
        ],
    )


@replay("q_quality_sweep")
def r_quality_sweep(t: Tables) -> pd.DataFrame:
    scored = []
    for text in t.documents["text"]:
        toks = _tokens(text)
        scored.append((_quality_score_py(text), len(toks)))
    rows = []
    for th in SWEEP_THRESHOLDS:
        kept = [(s, n) for s, n in scored if s >= th]
        rows.append(
            (th, len(kept), sum(n for _, n in kept))
        )
    return pd.DataFrame(
        rows, columns=["threshold", "docs_kept", "tokens_kept"]
    )


@replay("q_inverted_index")
def r_inverted_index(t: Tables) -> pd.DataFrame:
    from collections import Counter

    postings: dict[str, set] = {}
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        for tok in set(_tokens(text)):
            postings.setdefault(tok, set()).add(int(doc_id))
    df = Counter({tok: len(s) for tok, s in postings.items()})
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
        :INDEX_TOP_TOKENS
    ]
    return pd.DataFrame(
        [
            (tok, c, ",".join(str(d) for d in sorted(postings[tok])))
            for tok, c in top
        ],
        columns=["token", "doc_freq", "postings"],
    )


@replay("q_phrase_search")
def r_phrase_search(t: Tables) -> pd.DataFrame:
    w1, w2 = PHRASE
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        hits = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2
        ]
        if hits:
            rows.append((int(doc_id), len(hits), hits[0] + 1))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_hits", "first_pos"]
    )


@replay("q_event_trigrams")
def r_event_trigrams(t: Tables) -> pd.DataFrame:
    from collections import Counter

    ev = t.events.sort_values(["user_id", "ts", "event_id"])
    tri: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for i in range(len(types) - 2):
            tri[(types[i], types[i + 1], types[i + 2])] += 1
    total = sum(tri.values())
    rows = [
        (a, b, c, n, _half_away_ratio(n, total, 6))
        for (a, b, c), n in sorted(tri.items())
    ]
    return pd.DataFrame(rows, columns=["a", "b", "c", "n_seq", "share"])


def _canon_url(d: int, source: str) -> tuple[str, str]:
    """(host, canonical_url) from the declared synth-URL residues and
    the published canonicalization rules, plain string ops."""
    scheme = "https" if d % 2 == 0 else "http"
    www = "WWW." if d % 3 == 0 else ""
    authority = (www + source + ".Example.COM").lower()
    port = "443" if d % 2 == 0 else ("8080" if d % 5 == 0 else "")
    if port:
        authority_full = authority + ":" + port
    else:
        authority_full = authority
    host = authority_full
    if ":" in host and host.rsplit(":", 1)[1].isdigit():
        host = host.rsplit(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    path = "/p/" + str(d % 7) + ("/" if d % 4 == 0 else "")
    canon_path = path.rstrip("/") or "/"
    params = ["utm_source=rss", "page=" + str(d % 5), "b=2", "a=1"]
    if d % 6 == 0:
        params.append("gclid=x")
    kept = sorted(
        p
        for p in params
        if p != ""
        and not p.startswith("utm_")
        and not p.startswith("fbclid=")
        and not p.startswith("gclid=")
    )
    cq = "&".join(kept)
    default = (scheme == "https" and port == "443") or (
        scheme == "http" and port == "80"
    )
    url = (
        scheme
        + "://"
        + host
        + ((":" + port) if port and not default else "")
        + canon_path
        + (("?" + cq) if cq else "")
    )
    return host, url


@replay("q_url_canonical")
def r_url_canonical(t: Tables) -> pd.DataFrame:
    rows = []
    for doc_id, source in zip(
        t.documents["doc_id"], t.documents["source"]
    ):
        host, url = _canon_url(int(doc_id), str(source))
        rows.append((int(doc_id), host, url))
    return pd.DataFrame(
        rows, columns=["doc_id", "host", "canonical_url"]
    )


@replay("q_url_dedup")
def r_url_dedup(t: Tables) -> pd.DataFrame:
    agg: dict[str, list[int]] = {}
    for doc_id, source in zip(
        t.documents["doc_id"], t.documents["source"]
    ):
        _, url = _canon_url(int(doc_id), str(source))
        row = agg.setdefault(url, [0, int(doc_id)])
        row[0] += 1
        row[1] = min(row[1], int(doc_id))
    rows = [
        (url, c, k) for url, (c, k) in sorted(agg.items()) if c > 1
    ]
    return pd.DataFrame(
        rows, columns=["canonical_url", "dup_cnt", "keep_id"]
    )


@replay("q_crosslingual_dups")
def r_crosslingual_dups(t: Tables) -> pd.DataFrame:
    pairs = REPLAYS["q_similarity_near_dup_lsh"](t)
    lang = {
        int(d): str(lg)
        for d, lg in zip(t.documents["doc_id"], t.documents["lang"])
    }
    rows = [
        (a, b, c, lang[a], lang[b])
        for a, b, c in pairs.itertuples(index=False)
        if lang.get(a) is not None
        and lang.get(b) is not None
        and lang[a] != lang[b]
    ]
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "cos_sim", "lang_a", "lang_b"]
    )


# ---------------------------------------------------------------------------
# wave 12: embedding index builds, entity linkage, corpus hygiene
# filters — dense numpy / plain dict third implementations.
# ---------------------------------------------------------------------------

INCR_MOD = 10  # queries/similarity.py INCR_MOD
FUZZY_PREFIX = 8  # queries/dedup.py FUZZY_PREFIX
FUZZY_BODY = 96  # queries/dedup.py FUZZY_BODY
FUZZY_MAXD = 24  # queries/dedup.py FUZZY_MAXD
FUZZY_CAP = 1000  # queries/dedup.py FUZZY_CAP
BLOCKED_SOURCES = ("src3", "src7", "src13")  # queries/text.py
PII_MOD = 3  # queries/text.py PII_MOD
# operators/text.py EMAIL_PATTERN / PHONE_PATTERN
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
CASCADE_MIN_CHARS = 64  # queries/text.py CASCADE_MIN_CHARS
CASCADE_MIN_TOKENS = 10  # queries/text.py CASCADE_MIN_TOKENS
CASCADE_LANGS = ("de", "en", "es", "fr")  # queries/text.py CASCADE_LANGS


@replay("q_embedding_gram")
def r_embedding_gram(t: Tables) -> pd.DataFrame:
    _, m = _emb_matrix(t)
    X = np.trunc(m * 1e6).astype(np.int64)
    G = X.T @ X
    n = len(X)
    rows = [
        (i, j, int(G[i, j]), n)
        for i in range(DIM)
        for j in range(i, DIM)
    ]
    return pd.DataFrame(rows, columns=["i", "j", "s", "n_vecs"])


@replay("q_embedding_quantize")
def r_embedding_quantize(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    rows = []
    for vid, v in zip(ids, m):
        scale = float(np.max(np.abs(v))) / 127.0
        codes = [int(_spark_round(x / scale, 0)) for x in v]
        err = max(abs(x - c * scale) for x, c in zip(v, codes))
        rows.append(
            (
                int(vid),
                _spark_round(scale, 6),
                _spark_round(err, 6),
                sum(codes),
            )
        )
    return pd.DataFrame(
        rows, columns=["vec_id", "scale", "max_abs_err", "codes_sum"]
    )


def _ivf_assign_py(
    m: np.ndarray, ids: np.ndarray, cents: list[tuple[int, np.ndarray]]
) -> list[int]:
    """Nearest centroid per vector by 6-dp-rounded cosine, ties to the
    smaller centroid id."""
    out = []
    for v in m:
        best = None
        for cid, cv in cents:
            c6 = float(
                _rounded_cos(v, cv.reshape(1, -1))[0]
            )
            if best is None or c6 > best[0] or (c6 == best[0] and cid < best[1]):
                best = (c6, cid)
        out.append(best[1])
    return out


@replay("q_similarity_ivf_lists")
def r_similarity_ivf_lists(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    cents = [(int(ids[i]), m[i]) for i in range(N_CENTROIDS)]
    lists = _ivf_assign_py(m, ids, cents)
    return pd.DataFrame(
        {"vec_id": ids, "list_id": lists}
    )


@replay("q_ann_index")
def r_ann_index(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    buckets = _srp_buckets(m)
    cents = [(int(ids[i]), m[i]) for i in range(N_CENTROIDS)]
    lists = _ivf_assign_py(m, ids, cents)
    norms = [
        _spark_round(math.sqrt(float(v @ v)), 6) for v in m
    ]
    return pd.DataFrame(
        {
            "vec_id": ids,
            "norm": norms,
            "bucket": buckets.astype(np.int32),
            "list_id": lists,
        }
    )


@replay("q_ann_index_drift")
def r_ann_index_drift(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    base_idx = [i for i in range(len(ids)) if int(ids[i]) % INCR_MOD != 0]
    batch_idx = [i for i in range(len(ids)) if int(ids[i]) % INCR_MOD == 0]
    cents = [(int(ids[i]), m[i]) for i in base_idx[:N_CENTROIDS]]
    nb: dict[int, int] = {}
    for lid in _ivf_assign_py(m[base_idx], ids[base_idx], cents):
        nb[lid] = nb.get(lid, 0) + 1
    nn: dict[int, int] = {}
    for lid in _ivf_assign_py(m[batch_idx], ids[batch_idx], cents):
        nn[lid] = nn.get(lid, 0) + 1
    rows = []
    for lid in sorted(set(nb) | set(nn)):
        b, nw = nb.get(lid, 0), nn.get(lid, 0)
        rows.append((lid, b, nw, _spark_round(nw / (b or 1), 6)))
    return pd.DataFrame(
        rows, columns=["list_id", "n_base", "n_new", "growth_ratio"]
    )


@replay("q_embedding_dup_clusters")
def r_embedding_dup_clusters(t: Tables) -> pd.DataFrame:
    e = t.embeddings.sort_values("vec_id")
    ids = [int(x) for x in e["vec_id"]]
    m = np.stack([np.asarray(v, np.float64) for v in e["embedding"]])
    by_label: dict[int, list[int]] = {}
    for idx, lab in enumerate(e["label"]):
        by_label.setdefault(int(lab), []).append(idx)
    pairs = []
    for members in by_label.values():
        for i in range(len(members) - 1):
            ai = members[i]
            cand = members[i + 1 :]
            cos4 = _rounded_cos(m[ai], m[cand], 4)
            for cj, c4 in zip(cand, cos4):
                if c4 >= NEAR_T:
                    pairs.append((ids[ai], ids[cj]))
    comp = _components(pairs)
    return pd.DataFrame(
        sorted(comp.items()), columns=["vec_id", "cluster_id"]
    )


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _fuzzy_pairs_replay(t: Tables) -> list[tuple[int, int, str, int]]:
    blocks: dict[tuple[str, str], list[tuple[int, str]]] = {}
    for doc_id, lang, text in zip(
        t.documents["doc_id"], t.documents["lang"], t.documents["text"]
    ):
        s = "".join(ch for ch in text if ord(ch) < 128)
        blocks.setdefault(
            (str(lang), s[:FUZZY_PREFIX]), []
        ).append((int(doc_id), s[FUZZY_PREFIX : FUZZY_PREFIX + FUZZY_BODY]))
    out = []
    for (lang, _), members in blocks.items():
        if len(members) > FUZZY_CAP:
            continue
        members = sorted(members)
        for i in range(len(members) - 1):
            for j in range(i + 1, len(members)):
                d = _levenshtein(members[i][1], members[j][1])
                if d <= FUZZY_MAXD:
                    out.append((members[i][0], members[j][0], lang, d))
    return out


@replay("q_fuzzy_match")
def r_fuzzy_match(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        sorted(_fuzzy_pairs_replay(t)),
        columns=["id_a", "id_b", "lang", "edit_dist"],
    )


@replay("q_entity_resolution")
def r_entity_resolution(t: Tables) -> pd.DataFrame:
    comp = _components(
        [(a, b) for a, b, _, _ in _fuzzy_pairs_replay(t)]
    )
    agg: dict[int, list[int]] = {}
    for doc_id, rep in comp.items():
        row = agg.setdefault(rep, [0, doc_id])
        row[0] += 1
        row[1] = max(row[1], doc_id)
    return pd.DataFrame(
        sorted((e, n, mx) for e, (n, mx) in agg.items()),
        columns=["entity_id", "n_members", "max_member"],
    )


@replay("q_entity_matches")
def r_entity_matches(t: Tables) -> pd.DataFrame:
    import hashlib

    meta = {
        int(d): (str(s), hashlib.md5(x.encode()).hexdigest(), len(x))
        for d, s, x in zip(
            t.documents["doc_id"],
            t.documents["source"],
            t.documents["text"],
        )
    }
    rows = []
    for a, b, est in _minhash_pairs_replay(t):
        sa, fa, la = meta[a]
        sb, fb, lb = meta[b]
        exact = fa == fb
        cls = "exact" if exact else ("strong" if est >= 0.9 else "candidate")
        rows.append(
            (
                a,
                b,
                est,
                _spark_round(min(la, lb) / max(la, lb), 4),
                sa == sb,
                exact,
                cls,
            )
        )
    return pd.DataFrame(
        sorted(rows),
        columns=[
            "doc_a",
            "doc_b",
            "est_jaccard",
            "len_ratio",
            "same_source",
            "exact_equal",
            "match_class",
        ],
    )


@replay("q_global_ids")
def r_global_ids(t: Tables) -> pd.DataFrame:
    ev = t.events[["ts", "event_id"]].sort_values(["ts", "event_id"])
    return pd.DataFrame(
        {
            "event_id": ev["event_id"].to_numpy(),
            "global_id": np.arange(len(ev), dtype=np.int64),
        }
    )


@replay("q_fingerprint")
def r_fingerprint(t: Tables) -> pd.DataFrame:
    import hashlib

    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = sorted(set(text.split(" ")))
        rows.append(
            (
                int(doc_id),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
                len(toks),
            )
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "fingerprint", "vocab_size"]
    )


@replay("q_winsorize")
def r_winsorize(t: Tables) -> pd.DataFrame:
    rows = []
    for et, g in t.events.groupby("event_type"):
        vals = np.sort(g["value"].to_numpy(np.float64))
        n = len(vals)
        p01 = vals[max(1, math.ceil(n * 0.01)) - 1]
        p99 = vals[math.ceil(n * 0.99) - 1]
        rows.append(
            (
                str(et),
                n,
                int((vals < p01).sum()),
                int((vals > p99).sum()),
                p01,
                p99,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "n_total",
            "n_clamped_low",
            "n_clamped_high",
            "p01",
            "p99",
        ],
    )


@replay("q_skyline")
def r_skyline(t: Tables) -> pd.DataFrame:
    pts = []
    for doc_id, text, n_chars in zip(
        t.documents["doc_id"], t.documents["text"], t.documents["n_chars"]
    ):
        nonspace = len(text) - text.count(" ")
        y = (nonspace * 1000) // (text.count(" ") + 1)
        pts.append((int(doc_id), int(n_chars), y))
    ymax: dict[int, int] = {}
    for _, x, y in pts:
        ymax[x] = max(ymax.get(x, y), y)
    frontier = set()
    prev = None
    for x in sorted(ymax, reverse=True):
        if prev is None or ymax[x] > prev:
            frontier.add((x, ymax[x]))
            prev = ymax[x] if prev is None else max(prev, ymax[x])
    rows = [
        (d, x, y) for d, x, y in pts if (x, y) in frontier
    ]
    return pd.DataFrame(
        sorted(rows), columns=["doc_id", "n_chars", "awl_x1000"]
    )


@replay("q_domain_blocklist")
def r_domain_blocklist(t: Tables) -> pd.DataFrame:
    blocked = {f"{s}.example.com" for s in BLOCKED_SOURCES}
    agg: dict[str, list[int]] = {}
    for doc_id, source in zip(
        t.documents["doc_id"], t.documents["source"]
    ):
        host, _ = _canon_url(int(doc_id), str(source))
        row = agg.setdefault(str(source), [0, 0])
        row[0] += 1
        row[1] += 1 if host in blocked else 0
    return pd.DataFrame(
        sorted((s, n, b) for s, (n, b) in agg.items()),
        columns=["source", "n_urls", "n_blocked"],
    )


@replay("q_pii_scrub")
def r_pii_scrub(t: Tables) -> pd.DataFrame:
    import hashlib
    import re

    email_re = re.compile(EMAIL_PATTERN)
    phone_re = re.compile(PHONE_PATTERN)
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        d = int(doc_id)
        if d % PII_MOD == 0:
            text = (
                text
                + " contact user"
                + str(d)
                + "@example.com or 555-123-"
                + str(d % 10000).rjust(4, "0")
            )
        n_emails = len(email_re.findall(text))
        n_phones = len(phone_re.findall(text))
        scrubbed = phone_re.sub(
            "<PHONE>", email_re.sub("<EMAIL>", text)
        )
        rows.append(
            (
                d,
                n_emails,
                n_phones,
                hashlib.md5(scrubbed.encode()).hexdigest(),
            )
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_emails", "n_phones", "scrubbed_md5"]
    )


@replay("q_filter_cascade")
def r_filter_cascade(t: Tables) -> pd.DataFrame:
    import hashlib

    first_by_fp: dict[str, int] = {}
    docs = []
    for doc_id, src, lang, text, n_chars in zip(
        t.documents["doc_id"],
        t.documents["source"],
        t.documents["lang"],
        t.documents["text"],
        t.documents["n_chars"],
    ):
        d = int(doc_id)
        fp = hashlib.md5(text.encode()).hexdigest()
        if fp not in first_by_fp or d < first_by_fp[fp]:
            first_by_fp[fp] = d
        docs.append((d, str(src), str(lang), text, int(n_chars), fp))
    agg: dict[str, list[int]] = {}
    for d, src, lang, text, n_chars, fp in docs:
        len_ok = n_chars >= CASCADE_MIN_CHARS
        lang_ok = lang in CASCADE_LANGS
        tok_ok = len(_tokens(text)) >= CASCADE_MIN_TOKENS
        uniq_ok = first_by_fp[fp] == d
        row = agg.setdefault(src, [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += len_ok
        row[2] += len_ok and lang_ok
        row[3] += len_ok and lang_ok and tok_ok
        row[4] += len_ok and lang_ok and tok_ok and uniq_ok
    return pd.DataFrame(
        sorted((s, *v) for s, v in agg.items()),
        columns=[
            "source",
            "n_total",
            "after_length",
            "after_lang",
            "after_tokens",
            "after_dedup",
        ],
    )


# ---------------------------------------------------------------------------
# wave 13: event/session analytics, privacy audits, PIT features,
# composition pipelines — plain sequential Python over grouped rows.
# ---------------------------------------------------------------------------

K_ANON = 5  # queries/dq.py K_ANON
L_DIVERSITY = 3  # queries/dq.py L_DIVERSITY
SESSION_GAP_MIN = 30  # queries/relational.py q_sessionize gap


def _sessions(t: Tables):
    """(user_id, [(ts, value)...] per 30-min-gap session) in ts order."""
    ev = t.events.sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    for uid, g in ev.groupby("user_id"):
        cur = []
        prev = None
        for ts, val in zip(g["ts"], g["value"]):
            if prev is not None and ts - prev >= gap:
                yield int(uid), cur
                cur = []
            cur.append((ts, float(val)))
            prev = ts
        if cur:
            yield int(uid), cur


@replay("q_sessionize")
def r_sessionize(t: Tables) -> pd.DataFrame:
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    rows = []
    for uid, evs in _sessions(t):
        rows.append(
            (
                uid,
                evs[0][0],
                evs[-1][0] + gap,
                len(evs),
                _spark_round(math.fsum(v for _, v in evs), 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        ],
    )


@replay("q_sessionize_batch")
def r_sessionize_batch(t: Tables) -> pd.DataFrame:
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    rows = []
    for uid, evs in _sessions(t):
        s6 = sum(int(np.rint(v * 1e6)) for _, v in evs)  # exact decimal(18,6)
        rows.append(
            (uid, evs[0][0], evs[-1][0] + gap, len(evs), s6 / 1e6)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        ],
    )


@replay("q_first_seen_batch")
def r_first_seen_batch(t: Tables) -> pd.DataFrame:
    ev = t.events.sort_values(["ts", "event_id"])
    out = ev.groupby(["user_id", "event_type"], as_index=False).first()
    return out[["user_id", "event_type", "event_id", "ts", "value"]]


@replay("q_trending_batch")
def r_trending_batch(t: Tables) -> pd.DataFrame:
    from collections import Counter

    per_src: dict[str, Counter] = {}
    for src, text in zip(t.documents["source"], t.documents["text"]):
        per_src.setdefault(str(src), Counter()).update(_tokens(text))
    rows = []
    for src in sorted(per_src):
        top = sorted(
            per_src[src].items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
        for r, (tok, n) in enumerate(top, start=1):
            rows.append((src, tok, n, r))
    return pd.DataFrame(rows, columns=["source", "token", "n", "rank"])


def _stage_firsts(t: Tables, stages: list[str], strict: bool) -> list[dict]:
    """Chained per-user first-timestamp stages; strict=True requires
    ts > prev stage, else ts >= prev."""
    ev = t.events
    frames = []
    cur: dict[int, pd.Timestamp] = {}
    for si, st in enumerate(stages):
        nxt: dict[int, pd.Timestamp] = {}
        for uid, typ, ts in zip(ev["user_id"], ev["event_type"], ev["ts"]):
            if str(typ) != st:
                continue
            u = int(uid)
            if si > 0:
                prev = cur.get(u)
                if prev is None:
                    continue
                if strict and not ts > prev:
                    continue
                if not strict and not ts >= prev:
                    continue
            if u not in nxt or ts < nxt[u]:
                nxt[u] = ts
        frames.append(nxt)
        cur = nxt
    return frames


@replay("q_funnel")
def r_funnel(t: Tables) -> pd.DataFrame:
    s, c, p = _stage_firsts(t, ["signup", "click", "purchase"], strict=True)
    return pd.DataFrame(
        {
            "n_signup": [len(s)],
            "n_click_after": [len(c)],
            "n_purchase_after": [len(p)],
        }
    )


@replay("q_event_funnel")
def r_event_funnel(t: Tables) -> pd.DataFrame:
    stages = ["signup", "view", "click", "purchase"]
    frames = _stage_firsts(t, stages, strict=False)
    n0 = len(frames[0])
    rows = [
        (i + 1, st, len(f), _spark_round(len(f) / n0, 4))
        for i, (st, f) in enumerate(zip(stages, frames))
    ]
    return pd.DataFrame(
        rows, columns=["stage_idx", "stage", "n_users", "pct_of_entry"]
    )


@replay("q_outliers")
def r_outliers(t: Tables) -> pd.DataFrame:
    rows = []
    for et, g in t.events.groupby("event_type"):
        v = g["value"].to_numpy(np.float64)
        n = len(v)
        s = sum(int(np.rint(x * 1e8)) for x in v)  # exact decimal(28,8)
        s2 = sum(int(np.rint(x * x * 1e8)) for x in v)
        mean = (s / 1e8) / n
        std = math.sqrt((s2 / 1e8) / n - mean * mean)
        for eid, x in zip(g["event_id"], v):
            z = (x - mean) / std
            if abs(z) > 3:
                rows.append((int(eid), str(et), x, z))
    return pd.DataFrame(
        sorted(rows), columns=["event_id", "event_type", "value", "z_score"]
    )


@replay("q_click_attribution")
def r_click_attribution(t: Tables) -> pd.DataFrame:
    ev = t.events
    horizon = pd.Timedelta(minutes=30)
    views = ev[ev["event_type"] == "view"]
    clicks = ev[ev["event_type"] == "click"]
    by_user: dict[int, list] = {}
    for uid, eid, ts in zip(
        views["user_id"], views["event_id"], views["ts"]
    ):
        by_user.setdefault(int(uid), []).append((int(eid), ts))
    rows = []
    for uid, eid, ts, val in zip(
        clicks["user_id"], clicks["event_id"], clicks["ts"], clicks["value"]
    ):
        for vid, vts in by_user.get(int(uid), []):
            if vts <= ts <= vts + horizon:
                rows.append(
                    (int(uid), vid, vts, int(eid), ts, float(val))
                )
    return pd.DataFrame(
        sorted(rows),
        columns=[
            "user_id",
            "view_id",
            "view_ts",
            "click_id",
            "click_ts",
            "click_value",
        ],
    )


@replay("q_activity_heatmap")
def r_activity_heatmap(t: Tables) -> pd.DataFrame:
    agg: dict[tuple[int, int], list[int]] = {}
    for ts, val in zip(t.events["ts"], t.events["value"]):
        p = pd.Timestamp(ts)
        dow = (p.weekday() + 1) % 7 + 1  # Spark: Sunday=1..Saturday=7
        row = agg.setdefault((dow, p.hour), [0, 0])
        row[0] += 1
        row[1] += int(np.rint(float(val) * 100))  # exact cents
    rows = []
    for (dow, hod), (n, cents) in sorted(agg.items()):
        rows.append((dow, hod, n, _half_away_ratio(cents, n * 100, 4)))
    return pd.DataFrame(
        rows, columns=["dow", "hod", "n_events", "avg_value"]
    )


@replay("q_retention_cohorts")
def r_retention_cohorts(t: Tables) -> pd.DataFrame:
    import datetime

    ev = t.events
    first: dict[int, datetime.date] = {}
    days: dict[int, set] = {}
    for uid, ts in zip(ev["user_id"], ev["ts"]):
        u = int(uid)
        d = pd.Timestamp(ts).date()
        days.setdefault(u, set()).add(d)
        if u not in first or d < first[u]:
            first[u] = d
    agg: dict[tuple, set] = {}
    for u, ds in days.items():
        anchor = first[u]
        cw = anchor - datetime.timedelta(days=anchor.weekday())
        for d in ds:
            agg.setdefault((cw, (d - anchor).days // 7), set()).add(u)
    rows = [
        (pd.Timestamp(cw), ws, len(users))
        for (cw, ws), users in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows, columns=["cohort_week", "week_since", "active_users"]
    )


@replay("q_rfm_segments")
def r_rfm_segments(t: Tables) -> pd.DataFrame:
    import datetime

    asof = datetime.date(2001, 9, 1)
    per: dict[int, list] = {}
    for ck, od, tp in zip(
        t.orders["o_custkey"], t.orders["o_orderdate"], t.orders["o_totalprice"]
    ):
        d = pd.Timestamp(od).date()
        row = per.setdefault(int(ck), [d, 0, 0])
        row[0] = max(row[0], d)
        row[1] += 1
        row[2] += int(np.rint(float(tp) * 100))
    agg: dict[str, list] = {}
    for _, (last, freq, cents) in per.items():
        rec = (asof - last).days
        if rec <= 180 and freq >= 12:
            seg = "champion"
        elif rec <= 180:
            seg = "recent"
        elif freq >= 12:
            seg = "loyal_lapsing"
        else:
            seg = "dormant"
        row = agg.setdefault(seg, [0, 0, 10**9, 0])
        row[0] += 1
        row[1] += cents
        row[2] = min(row[2], rec)
        row[3] = max(row[3], freq)
    rows = [
        (seg, n, cents / 100.0, mn, mx)
        for seg, (n, cents, mn, mx) in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "segment",
            "customers",
            "segment_value",
            "min_recency",
            "max_frequency",
        ],
    )


@replay("q_k_anonymity")
def r_k_anonymity(t: Tables) -> pd.DataFrame:
    from collections import Counter

    cls = Counter(
        (str(lg), str(s))
        for lg, s in zip(t.documents["lang"], t.documents["source"])
    )
    ns = list(cls.values())
    below = [n for n in ns if n < K_ANON]
    return pd.DataFrame(
        {
            "n_classes": [len(ns)],
            "k_min": [min(ns)],
            "n_below_k": [len(below)],
            "rows_below_k_frac": [_spark_round(sum(below) / sum(ns), 6)],
        }
    )


@replay("q_l_diversity")
def r_l_diversity(t: Tables) -> pd.DataFrame:
    per: dict[tuple, set] = {}
    cnt: dict[tuple, int] = {}
    for lg, s, nc in zip(
        t.documents["lang"], t.documents["source"], t.documents["n_chars"]
    ):
        key = (str(lg), str(s))
        per.setdefault(key, set()).add(int(nc) // L_DIV_BUCKET)
        cnt[key] = cnt.get(key, 0) + 1
    rows = [
        (lg, s, cnt[(lg, s)], len(sens), 1 if len(sens) < L_DIVERSITY else 0)
        for (lg, s), sens in sorted(per.items())
    ]
    return pd.DataFrame(
        rows, columns=["lang", "source", "cls_n", "l_distinct", "below_l"]
    )


@replay("q_profile_drift")
def r_profile_drift(t: Tables) -> pd.DataFrame:
    ev = t.events
    cut1 = pd.Timestamp("2024-01-08")
    cut2 = pd.Timestamp("2024-01-15")
    agg: dict[str, list] = {}
    for et, uid, ts, val in zip(
        ev["event_type"], ev["user_id"], ev["ts"], ev["value"]
    ):
        if ts >= cut2:
            continue
        wk1 = ts < cut1
        row = agg.setdefault(str(et), [0, 0, set(), set(), 0, 0])
        v4 = int(np.rint(float(val) * 1e4))
        if wk1:
            row[0] += 1
            row[2].add(int(uid))
            row[4] += v4
        else:
            row[1] += 1
            row[3].add(int(uid))
            row[5] += v4
    rows = []
    for et in sorted(agg):
        n1, n2, u1, u2, s1, s2 = agg[et]
        rows.append(
            (
                et,
                n1,
                n2,
                len(u1),
                len(u2),
                _half_away_ratio(s1, n1 * 10**4, 4),
                _half_away_ratio(s2, n2 * 10**4, 4),
                _half_away_ratio((n2 - n1) * 10000 * 100, n1 * 100, 2),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "n_wk1",
            "n_wk2",
            "users_wk1",
            "users_wk2",
            "avg_val_wk1",
            "avg_val_wk2",
            "vol_drift_pct",
        ],
    )


@replay("q_agg_approx")
def r_agg_approx(t: Tables) -> pd.DataFrame:
    by_type: dict[str, set] = {}
    cnt: dict[str, int] = {}
    for et, uid in zip(t.events["event_type"], t.events["user_id"]):
        k = str(et)
        by_type.setdefault(k, set()).add(
            _portable_hash(str(int(uid)), "kmv")
        )
        cnt[k] = cnt.get(k, 0) + 1
    rows = []
    for et in sorted(by_type):
        kept = sorted(by_type[et])[:KMV_K]
        rows.append((et, _kmv_est(len(kept), kept[-1]), cnt[et]))
    return pd.DataFrame(
        rows, columns=["event_type", "approx_users", "event_cnt"]
    )


@replay("q_point_in_time_features")
def r_point_in_time_features(t: Tables) -> pd.DataFrame:
    o = t.orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    rows = []
    for ck, g in o.groupby("o_custkey", sort=True):
        cents = 0
        n = 0
        keep = int(ck) % 100 == 0
        for ok, od, tp in zip(
            g["o_orderkey"], g["o_orderdate"], g["o_totalprice"]
        ):
            if keep:
                rows.append(
                    (int(ck), int(ok), od, n, cents / 100.0)
                )
            n += 1
            cents += int(np.rint(float(tp) * 100))
    return pd.DataFrame(
        rows,
        columns=[
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "prior_orders",
            "prior_spend",
        ],
    )


QUALITY_CUT = 0.3  # queries/text.py QUALITY_CUT
CHUNK_TOKENS = 32  # queries/text.py q_doc_chunks chunk_tokens
CHUNK_STRIDE = 24  # queries/text.py q_doc_chunks stride


@replay("q_doc_chunks")
def r_doc_chunks(t: Tables) -> pd.DataFrame:
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        toks = _tokens(text)
        for start in range(0, len(toks), CHUNK_STRIDE):
            end = min(start + CHUNK_TOKENS, len(toks))
            rows.append(
                (
                    int(doc_id),
                    start // CHUNK_STRIDE,
                    start,
                    end,
                    end - start,
                    " ".join(toks[start:end]),
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id",
            "chunk_idx",
            "tok_start",
            "tok_end",
            "n_chunk_toks",
            "chunk_text",
        ],
    )


@replay("q_rag_index_pipeline")
def r_rag_index_pipeline(t: Tables) -> pd.DataFrame:
    ids, m = _emb_matrix(t)
    bucket = {
        int(i): int(b) for i, b in zip(ids, _srp_buckets(m))
    }
    meta = {
        int(d): (str(lg), str(s))
        for d, lg, s in zip(
            t.documents["doc_id"], t.documents["lang"], t.documents["source"]
        )
    }
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        d = int(doc_id)
        if d not in bucket or d not in meta:
            continue
        toks = _tokens(text)
        for start in range(0, len(toks), CHUNK_STRIDE):
            end = min(start + CHUNK_TOKENS, len(toks))
            rows.append(
                (
                    d,
                    start // CHUNK_STRIDE,
                    start,
                    end,
                    end - start,
                    bucket[d],
                    meta[d][0],
                    meta[d][1],
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id",
            "chunk_idx",
            "tok_start",
            "tok_end",
            "n_chunk_toks",
            "bucket",
            "lang",
            "source",
        ],
    )


@replay("q_substring_dup_spans")
def r_substring_dup_spans(t: Tables) -> pd.DataFrame:
    """Un-anchored exact substring spans: every 32-gram position,
    global count >= 2, gaps-and-islands merge (anchor_mod = 1)."""
    from collections import Counter

    positions: dict[int, list[tuple[int, int]]] = {}
    counts: Counter = Counter()
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        if len(text) < ANCHOR_GRAM:
            continue
        d = int(doc_id)
        for p in range(1, len(text) - ANCHOR_GRAM + 2):
            gk = _portable_hash(text[p - 1 : p - 1 + ANCHOR_GRAM])
            positions.setdefault(d, []).append((p, gk))
            counts[gk] += 1
    rows = []
    for d in sorted(positions):
        dup_pos = sorted(p for p, gk in positions[d] if counts[gk] >= 2)
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev <= ANCHOR_GRAM:
                prev = p
            else:
                rows.append((d, start, prev + 31, prev + 31 - start + 1))
                start = prev = p
        rows.append((d, start, prev + 31, prev + 31 - start + 1))
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end", "span_len"]
    )


def _merge_islands(ivals: set) -> dict[int, list[tuple[int, int]]]:
    """DISTINCT (doc, s, e) intervals -> per-doc merged spans; a new
    island only when s > max(previous e)."""
    by_doc: dict[int, list] = {}
    for d, s, e in sorted(ivals):
        by_doc.setdefault(d, []).append((s, e))
    out: dict[int, list[tuple[int, int]]] = {}
    for d, sp in by_doc.items():
        merged = []
        cur_s, cur_e = None, None
        for s, e in sp:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    merged.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        merged.append((cur_s, cur_e))
        out[d] = merged
    return out


def _apply_spans(t: Tables, ivals: set) -> pd.DataFrame:
    spans = _merge_islands(ivals)
    rows = []
    for doc_id, text in zip(t.documents["doc_id"], t.documents["text"]):
        d = int(doc_id)
        if d % SUFFIX_DOC_MOD != 0:
            continue
        sp = spans.get(d)
        if not sp:
            rows.append((d, text, 0))
            continue
        kept, prev = [], 0
        for s, e in sp:
            kept.append(text[prev:s])
            prev = e
        kept.append(text[prev:])
        rows.append((d, "".join(kept), sum(e - s for s, e in sp)))
    return pd.DataFrame(
        rows, columns=["doc_id", "cleaned_text", "n_chars_removed"]
    )


@replay("q_suffix_dedup_apply")
def r_suffix_dedup_apply(t: Tables) -> pd.DataFrame:
    ivals: set = set()
    for _, d, p, nd, np_, lcp in _suffix_adjacent_pairs(t):
        if lcp < SUFFIX_MIN_LCP:
            continue
        ivals.add((d, p, p + lcp))
        ivals.add((nd, np_, np_ + lcp))
    return _apply_spans(t, ivals)


@replay("q_suffix_dedup_apply_keep_first")
def r_suffix_dedup_apply_keep_first(t: Tables) -> pd.DataFrame:
    pairs = [
        p for p in _suffix_adjacent_pairs(t) if p[5] >= SUFFIX_MIN_LCP
    ]
    runs: list[list] = []
    prev_rank = None
    for p in pairs:  # sa_rank ascending
        if prev_rank is not None and p[0] == prev_rank + 1:
            runs[-1].append(p)
        else:
            runs.append([p])
        prev_rank = p[0]
    ivals: set = set()
    for run in runs:
        members = set()
        for _, d, pos, nd, npos, lcp in run:
            members.add((d, pos))
            members.add((nd, npos))
            later = (nd, npos) if (nd, npos) > (d, pos) else (d, pos)
            ivals.add((later[0], later[1], later[1] + lcp))
        rmin = min(members)
        rl = min(p[5] for p in run)
        for m in members:
            if m != rmin:
                ivals.add((m[0], m[1], m[1] + rl))
    return _apply_spans(t, ivals)


@replay("q_curation_pipeline")
def r_curation_pipeline(t: Tables) -> pd.DataFrame:
    """The five-stage curation funnel composed sequentially in plain
    Python: quality gate -> exact keep-first -> decontamination ->
    source quota -> per-language token budget."""
    import hashlib

    docs = []
    for doc_id, lang, src, text in zip(
        t.documents["doc_id"],
        t.documents["lang"],
        t.documents["source"],
        t.documents["text"],
    ):
        docs.append(
            (
                int(doc_id),
                str(lang),
                str(src),
                text,
                _quality_score_py(text),
                0 if text == "" else len(_tokens(text)),
            )
        )
    s1 = [r for r in docs if r[4] >= QUALITY_CUT]
    seen_fp: set = set()
    s2 = []
    for r in sorted(s1):
        fp = hashlib.md5(r[3].encode()).hexdigest()
        if fp not in seen_fp:
            seen_fp.add(fp)
            s2.append(r)
    ev_shingles: set = set()
    for r in docs:
        if r[0] % EVAL_MOD == 0:
            ev_shingles.update(_shingles(r[3], DECONTAM_N))
    s3 = [
        r
        for r in s2
        if r[0] % EVAL_MOD != 0
        and not (set(_shingles(r[3], DECONTAM_N)) & ev_shingles)
    ]
    by_src: dict[str, list] = {}
    for r in s3:
        by_src.setdefault(r[2], []).append(
            ((_portable_hash(r[3], "quota"), r[0]), r)
        )
    s4 = [
        r
        for members in by_src.values()
        for _, r in sorted(members)[:SOURCE_QUOTA]
    ]
    by_lang: dict[str, list] = {}
    for r in s4:
        by_lang.setdefault(r[1], []).append(r)
    rows = []
    for lang in sorted(by_lang):
        cum = 0
        for r in sorted(by_lang[lang], key=lambda x: (-x[4], x[0])):
            cum += r[5]
            if cum > TOKEN_BUDGET:
                break
            rows.append((r[0], r[1], r[2], r[4], cum))
    return pd.DataFrame(
        sorted(rows),
        columns=["doc_id", "lang", "source", "score", "cum_tokens"],
    )


@replay("q_curriculum_shards")
def r_curriculum_shards(t: Tables) -> pd.DataFrame:
    docs = sorted(
        (int(nc), int(d))
        for d, nc in zip(t.documents["doc_id"], t.documents["n_chars"])
    )
    n = len(docs)
    agg: dict[tuple[int, int], list[int]] = {}
    for rank, (nc, d) in enumerate(docs):
        stage = (rank * 10) // n
        shard = _portable_hash(str(d), "shard") % 4
        row = agg.setdefault((stage, shard), [0, nc, nc])
        row[0] += 1
        row[1] = min(row[1], nc)
        row[2] = max(row[2], nc)
    rows = [
        (st, sh, n_docs, mn, mx)
        for (st, sh), (n_docs, mn, mx) in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows,
        columns=["stage", "shard", "n_docs", "min_chars", "max_chars"],
    )


@replay("q_similarity_near_dup")
def r_similarity_near_dup(t: Tables) -> pd.DataFrame:
    e = t.embeddings.sort_values("vec_id")
    ids = [int(x) for x in e["vec_id"]]
    m = np.stack([np.asarray(v, np.float64) for v in e["embedding"]])
    by_label: dict[int, list[int]] = {}
    for idx, lab in enumerate(e["label"]):
        by_label.setdefault(int(lab), []).append(idx)
    rows = []
    for members in by_label.values():
        for i in range(len(members) - 1):
            ai = members[i]
            cand = members[i + 1 :]
            cos4 = _rounded_cos(m[ai], m[cand], 4)
            for cj, c4 in zip(cand, cos4):
                if c4 >= NEAR_T:
                    rows.append((ids[ai], ids[cj], c4))
    return pd.DataFrame(
        sorted(rows), columns=["id_a", "id_b", "cos_sim"]
    )


# ---------------------------------------------------------------------------
# wave 14: reference-parity ingest — the weather/cocktails transforms
# whose hand-built oracle SQL mirrors the same field list and casts
# (the one reference-parity surface with a real shared-expression
# channel). The replay re-derives the fixture documents AND the
# publish transforms standalone with the json/ast stdlib; the fixture
# regeneration and rename map are pinned byte-equal to production by
# check_constants.
# ---------------------------------------------------------------------------

R_CITIES = ["Seattle", "New York", "Los Angeles", "San Jose", "Fort Worth"]
R_RUN_HRS = [202401150000, 202401150100]

_R_COND = [
    ("Sunny", "s.png", 1000),
    ("Partly cloudy", "pc.png", 1003),
    ("Rain", "r.png", 1189),
]


def _r_weather_doc(city: str, i: int) -> dict:
    cond = _R_COND[i % 3]
    return {
        "location": {
            "name": city,
            "region": f"Region {i}",
            "country": "United States of America",
            "lat": round(30.0 + i * 1.25, 4),
            "lon": round(-120.0 + i * 2.5, 4),
            "tz_id": "America/Los_Angeles",
            "localtime_epoch": 1705305600 + i * 3600,
            "localtime": f"2024-01-15 {i:02d}:05",
        },
        "current": {
            "last_updated_epoch": 1705305000 + i * 3600,
            "last_updated": f"2024-01-15 {i:02d}:00",
            "temp_c": 5.5 + i,
            "temp_f": 41.9 + i * 1.8,
            "is_day": i % 2,
            "condition": {"text": cond[0], "icon": cond[1], "code": cond[2]},
            "wind_mph": 5.6 + i,
            "wind_kph": 9.0 + i,
            "wind_degree": 200 + i,
            "wind_dir": "SSW",
            "pressure_mb": 1020.0 + i,
            "pressure_in": 30.12,
            "precip_mm": 0.1 * i,
            "precip_in": 0.0,
            "humidity": 86 - i,
            "cloud": 25 * (i % 4),
            "feelslike_c": 4.3 + i,
            "feelslike_f": 39.7 + i,
            "vis_km": 16.0,
            "vis_miles": 9.0,
            "uv": 1.0 + (i % 3),
            "gust_mph": 9.8 + i,
            "gust_kph": 15.8 + i,
        },
    }


def r_weather_docs() -> list:
    """(city, run_hr, doc dict, compact json) per fixture contract."""
    import json as _json

    out = []
    for h, run_hr in enumerate(R_RUN_HRS):
        for c, city in enumerate(R_CITIES):
            doc = _r_weather_doc(city, h * len(R_CITIES) + c)
            out.append(
                (city, run_hr, doc, _json.dumps(doc, separators=(",", ":")))
            )
    return out


R_DRINKS = [{'dateModified': '2017-09-02 18:37:52',
  'idDrink': 17222.0,
  'strAlcoholic': 'Alcoholic',
  'strCategory': 'Cocktail',
  'strCreativeCommonsConfirmed': 'No',
  'strDrink': 'A1',
  'strDrinkAlternate': None,
  'strDrinkThumb': 'https://example.invalid/a1.jpg',
  'strGlass': 'Cocktail glass',
  'strIBA': None,
  'strImageAttribution': None,
  'strImageSource': None,
  'strIngredient1': 'Gin',
  'strIngredient2': 'Grand Marnier',
  'strIngredient3': 'Lemon Juice',
  'strIngredient4': 'Grenadine',
  'strInstructions': 'Pour all ingredients into a cocktail\n'
                     'shaker, mix and serve over ice into a chilled glass.',
  'strInstructionsDE': 'Alle Zutaten in einen Cocktailshaker geben.',
  'strInstructionsES': 'Vierta todos los ingredientes.',
  'strInstructionsFR': None,
  'strInstructionsIT': 'Versare tutti gli ingredienti.',
  'strInstructionsZH-HANS': None,
  'strInstructionsZH-HANT': None,
  'strMeasure1': '1 3/4 shot ',
  'strMeasure2': '1 Shot ',
  'strMeasure3': '1/4 Shot',
  'strMeasure4': '1/8 Shot',
  'strTags': 'IBA,Classic',
  'strVideo': None},
 {'dateModified': '2016-11-04 09:17:09',
  'idDrink': 13501.0,
  'strAlcoholic': 'Alcoholic',
  'strCategory': 'Shot',
  'strCreativeCommonsConfirmed': 'No',
  'strDrink': 'ABC',
  'strDrinkAlternate': None,
  'strDrinkThumb': 'https://example.invalid/abc.jpg',
  'strGlass': 'Shot glass',
  'strIBA': None,
  'strImageAttribution': None,
  'strImageSource': None,
  'strIngredient1': 'Amaretto',
  'strIngredient2': 'Baileys irish cream',
  'strIngredient3': 'Cognac',
  'strInstructions': 'Layered in a shot glass.',
  'strInstructionsDE': 'In einem Schnapsglas\rschichten.',
  'strInstructionsES': None,
  'strInstructionsFR': None,
  'strInstructionsIT': 'Stratificato in un bicchierino.',
  'strInstructionsZH-HANS': None,
  'strInstructionsZH-HANT': None,
  'strMeasure1': '1/3 ',
  'strMeasure2': '1/3 ',
  'strMeasure3': '1/3 ',
  'strTags': None,
  'strVideo': None},
 {'dateModified': '2016-08-31 19:32:08',
  'idDrink': 17225.0,
  'strAlcoholic': 'Alcoholic',
  'strCategory': 'Cocktail',
  'strCreativeCommonsConfirmed': 'Yes',
  'strDrink': 'Ace',
  'strDrinkAlternate': None,
  'strDrinkThumb': 'https://example.invalid/ace.jpg',
  'strGlass': 'Martini Glass',
  'strIBA': None,
  'strImageAttribution': None,
  'strImageSource': None,
  'strIngredient1': 'Gin',
  'strIngredient2': 'Grenadine',
  'strIngredient3': 'Heavy cream',
  'strIngredient4': 'Milk',
  'strIngredient5': 'Egg White',
  'strInstructions': 'Shake all the ingredients in a cocktail shaker and '
                     'ice then strain in a cold glass.',
  'strInstructionsDE': None,
  'strInstructionsES': None,
  'strInstructionsFR': None,
  'strInstructionsIT': 'Shakerare tutti gli ingredienti.',
  'strInstructionsZH-HANS': None,
  'strInstructionsZH-HANT': None,
  'strMeasure1': '2 shots ',
  'strMeasure2': '1/2 shot ',
  'strMeasure3': '1/2 shot ',
  'strMeasure4': '1/2 shot',
  'strMeasure5': '1/2 Fresh',
  'strTags': None,
  'strVideo': None}]

R_COCKTAIL_RENAME = {'dateModified': 'date_modified',
 'idDrink': 'id_drink',
 'strAlcoholic': 'alcoholic',
 'strCategory': 'category',
 'strCreativeCommonsConfirmed': 'creative_commons_confirmed',
 'strDrink': 'drink',
 'strDrinkAlternate': 'drink_alternate',
 'strDrinkThumb': 'drink_thumb',
 'strGlass': 'glass',
 'strIBA': 'iba',
 'strImageAttribution': 'image_attribution',
 'strImageSource': 'image_source',
 'strIngredient1': 'ingredient1',
 'strIngredient10': 'ingredient10',
 'strIngredient11': 'ingredient11',
 'strIngredient12': 'ingredient12',
 'strIngredient13': 'ingredient13',
 'strIngredient14': 'ingredient14',
 'strIngredient15': 'ingredient15',
 'strIngredient2': 'ingredient2',
 'strIngredient3': 'ingredient3',
 'strIngredient4': 'ingredient4',
 'strIngredient5': 'ingredient5',
 'strIngredient6': 'ingredient6',
 'strIngredient7': 'ingredient7',
 'strIngredient8': 'ingredient8',
 'strIngredient9': 'ingredient9',
 'strInstructions': 'instructions',
 'strInstructionsDE': 'instructions_de',
 'strInstructionsES': 'instructions_es',
 'strInstructionsFR': 'instructions_fr',
 'strInstructionsIT': 'instructions_it',
 'strInstructionsZH-HANS': 'instructions_zh_hans',
 'strInstructionsZH-HANT': 'instructions_zh_hant',
 'strMeasure1': 'measure1',
 'strMeasure10': 'measure10',
 'strMeasure11': 'measure11',
 'strMeasure12': 'measure12',
 'strMeasure13': 'measure13',
 'strMeasure14': 'measure14',
 'strMeasure15': 'measure15',
 'strMeasure2': 'measure2',
 'strMeasure3': 'measure3',
 'strMeasure4': 'measure4',
 'strMeasure5': 'measure5',
 'strMeasure6': 'measure6',
 'strMeasure7': 'measure7',
 'strMeasure8': 'measure8',
 'strMeasure9': 'measure9',
 'strTags': 'tags',
 'strVideo': 'video'}


def r_clean_json(s: str) -> str:
    """The declared repr-repair: strip newline/CR, literal_eval,
    re-serialize (default separators)."""
    import ast as _ast
    import json as _json
    import re as _re

    return _json.dumps(_ast.literal_eval(_re.sub(r"[\n\r]", "", s)))


def _r_full_drinks() -> list[dict]:
    return [{k: d.get(k) for k in R_COCKTAIL_RENAME} for d in R_DRINKS]


def r_cocktails_raw() -> str:
    doc = {"drinks": _r_full_drinks()}
    return str(doc).replace("\\n", "\n").replace("\\r", "\r")


def r_cocktails_json() -> str:
    return r_clean_json(r_cocktails_raw())


_W_LOC_STR = ("name", "region", "country", "tz_id")
_W_CUR_DBL = (
    "temp_c", "temp_f", "wind_mph", "wind_kph", "pressure_mb",
    "pressure_in", "precip_mm", "precip_in", "feelslike_c",
    "feelslike_f", "vis_km", "vis_miles", "uv", "gust_mph", "gust_kph",
)
_W_CUR_BIG = ("last_updated_epoch", "is_day", "wind_degree", "humidity", "cloud")


def _weather_row(doc: dict, run_hr: int, ts_parse: bool) -> dict:
    loc, cur = doc["location"], doc["current"]
    row = {"run_hr": run_hr}
    for f in _W_LOC_STR:
        row[f"loc_{f}"] = loc[f]
    row["loc_lat"] = float(loc["lat"])
    row["loc_lon"] = float(loc["lon"])
    row["loc_localtime_epoch"] = int(loc["localtime_epoch"])
    row["loc_localtime"] = (
        pd.Timestamp(loc["localtime"] + ":00") if ts_parse else loc["localtime"]
    )
    for f in _W_CUR_BIG:
        row[f"cur_{f}"] = int(cur[f])
    row["cur_last_updated"] = (
        pd.Timestamp(cur["last_updated"] + ":00")
        if ts_parse
        else cur["last_updated"]
    )
    for f in _W_CUR_DBL:
        row[f"cur_{f}"] = float(cur[f])
    row["cur_wind_dir"] = cur["wind_dir"]
    row["cond_text"] = cur["condition"]["text"]
    row["cond_icon"] = cur["condition"]["icon"]
    row["cond_code"] = int(cur["condition"]["code"])
    return row


@replay("q_weather_stage")
def r_weather_stage(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        [
            _weather_row(doc, run_hr, ts_parse=False)
            for _, run_hr, doc, _j in r_weather_docs()
        ]
    )


@replay("q_weather_insert")
def r_weather_insert(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        [
            _weather_row(doc, run_hr, ts_parse=True)
            for _, run_hr, doc, _j in r_weather_docs()
        ]
    )


@replay("q_weather_variant_stage")
def r_weather_variant_stage(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        [(run_hr, j) for _, run_hr, _d, j in r_weather_docs()],
        columns=["run_hr", "json_data"],
    )


def _weather_variant_frame() -> pd.DataFrame:
    import json as _json

    rows = []
    for _, run_hr, doc, _j in r_weather_docs():
        loc, cur = doc["location"], doc["current"]

        def vint(x) -> int:
            return int(_spark_round(float(x), 0))

        rows.append(
            {
                "run_hr": run_hr,
                "location_name": loc["name"],
                "local_time": pd.Timestamp(
                    loc["localtime"] + ":00"
                ).floor("h"),
                "temp_c": vint(cur["temp_c"]),
                "temp_f": vint(cur["temp_f"]),
                "is_day": bool(int(cur["is_day"])),
                "condition": _json.dumps(
                    cur["condition"], separators=(",", ":")
                ),
                "wind_kph": float(cur["wind_kph"]),
                "wind_mph": float(cur["wind_mph"]),
                "gust_kph": float(cur["gust_kph"]),
                "gust_mph": float(cur["gust_mph"]),
                "pressure_mb": vint(cur["pressure_mb"]),
                "pressure_in": vint(cur["pressure_in"]),
                "humidity": vint(cur["humidity"]),
                "cloud": vint(cur["cloud"]),
                "feelslike_c": vint(cur["feelslike_c"]),
                "feelslike_f": vint(cur["feelslike_f"]),
                "vis_km": vint(cur["vis_km"]),
                "vis_miles": vint(cur["vis_miles"]),
                "uv": vint(cur["uv"]),
            }
        )
    return pd.DataFrame(rows)


@replay("q_weather_variant_insert")
def r_weather_variant_insert(t: Tables) -> pd.DataFrame:
    return _weather_variant_frame()


@replay("q_weather_variant_native")
def r_weather_variant_native(t: Tables) -> pd.DataFrame:
    return _weather_variant_frame()


@replay("q_cocktails_stage")
def r_cocktails_stage(t: Tables) -> pd.DataFrame:
    drinks = _r_full_drinks()
    return pd.DataFrame(
        {
            "n_drinks": [len(drinks)],
            "first_drink": [drinks[0]["strDrink"]],
            "first_drink_id": [float(drinks[0]["idDrink"])],
            "last_drink": [drinks[-1]["strDrink"]],
        }
    )


@replay("q_cocktails_variant_stage")
def r_cocktails_variant_stage(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        [(R_RUN_HRS[0], r_cocktails_json())],
        columns=["run_hr", "json_data"],
    )


def _cocktails_frame(variant: bool) -> pd.DataFrame:
    import json as _json

    # publish consumes the REPAIRED document: the repair strips real
    # newline/CR chars from inside string values before literal_eval
    rows = []
    for d in _json.loads(r_cocktails_json())["drinks"]:
        row = {}
        for camel, snake in R_COCKTAIL_RENAME.items():
            v = d.get(camel)
            if camel == "dateModified":
                row[snake] = pd.Timestamp(v) if v is not None else None
            elif camel == "idDrink":
                if variant:
                    row["drink_id"] = (
                        int(_spark_round(float(v), 0)) if v is not None else None
                    )
                else:
                    row[snake] = float(v) if v is not None else None
            else:
                row[snake] = v
        row["run_hr"] = R_RUN_HRS[0]
        rows.append(row)
    return pd.DataFrame(rows)


@replay("q_cocktails_insert")
def r_cocktails_insert(t: Tables) -> pd.DataFrame:
    return _cocktails_frame(variant=False)


@replay("q_cocktails_variant_insert")
def r_cocktails_variant_insert(t: Tables) -> pd.DataFrame:
    return _cocktails_frame(variant=True)


@replay("q_cities_source")
def r_cities_source(t: Tables) -> pd.DataFrame:
    return pd.DataFrame({"city": R_CITIES})


@replay("q_city_normalize")
def r_city_normalize(t: Tables) -> pd.DataFrame:
    return pd.DataFrame(
        [(c, c.lower().replace(" ", "_")) for c in R_CITIES],
        columns=["city", "city_key"],
    )


@replay("q_clean_json")
def r_clean_json_query(t: Tables) -> pd.DataFrame:
    rows = []
    for city, run_hr, doc, _j in r_weather_docs():
        raw = str(doc)
        rows.append((f"weather:{city}:{run_hr}", r_clean_json(raw)))
    rows.append(("cocktails", r_cocktails_json()))
    return pd.DataFrame(rows, columns=["entity_key", "clean_body"])


@replay("q_run_hr_derive")
def r_run_hr_derive(t: Tables) -> pd.DataFrame:
    from collections import Counter

    c = Counter(
        pd.Timestamp(ts).strftime("%Y%m%d%H00") for ts in t.events["ts"]
    )
    return pd.DataFrame(
        sorted(c.items()), columns=["run_hr", "event_cnt"]
    )


@replay("q_explode")
def r_explode(t: Tables) -> pd.DataFrame:
    from collections import Counter

    c = Counter()
    for text in t.documents["text"]:
        c.update(_tokens(text))
    return pd.DataFrame(
        sorted(c.items()), columns=["token", "token_cnt"]
    )
