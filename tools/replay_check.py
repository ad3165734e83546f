"""Run the third-implementation replays (tools/replays.py) against the
live Spark registry queries and report mismatches.

This is the defense against the shared-expression bug class the
Spark-vs-DuckDB hash gate cannot catch (both engines running the same
wrong algorithm — the round-9 Hodges-Lehmann case): the replay derives
the expected output from the algorithm's published definition in
numpy/plain Python, importing NOTHING from the engine package.

Usage: python tools/replay_check.py [sf_dir] [query_name ...]
Exit code = number of failures.
"""

from __future__ import annotations

import math
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from replays import REPLAYS, Tables  # noqa: E402

# Float comparison: engine outputs are stabilized (doubles to 7
# significant digits via %.6e, many metrics rounded to 4 decimals), so
# an independently-associated replay may differ by one final-digit
# step. 1.5e-4 absolute covers a 4-decimal rounding straddle, 2e-6
# relative covers a 7-sig-digit one. An algorithmic bug moves values
# by orders of magnitude more than either.
ABS_TOL = 1.5e-4
REL_TOL = 2e-6


def _is_na(v) -> bool:
    try:
        return v is None or (isinstance(v, float) and math.isnan(v)) or pd.isna(v)
    except (TypeError, ValueError):
        return False


def _cell_match(a, b) -> bool:
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(
        b, (list, tuple, np.ndarray)
    ):
        if not isinstance(a, (list, tuple, np.ndarray)) or not isinstance(
            b, (list, tuple, np.ndarray)
        ):
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(
            _cell_match(x, y) for x, y in zip(la, lb)
        )
    if _is_na(a) and _is_na(b):
        return True
    if _is_na(a) or _is_na(b):
        return False
    if isinstance(a, (bool, np.bool_)) or isinstance(b, (bool, np.bool_)):
        return bool(a) == bool(b)
    an = isinstance(a, (int, float, np.integer, np.floating))
    bn = isinstance(b, (int, float, np.integer, np.floating))
    if an and bn:
        af, bf = float(a), float(b)
        ai = isinstance(a, (int, np.integer)) or af.is_integer()
        bi = isinstance(b, (int, np.integer)) or bf.is_integer()
        if ai and bi and isinstance(a, (int, np.integer)) and isinstance(
            b, (int, np.integer)
        ):
            return int(a) == int(b)
        d = abs(af - bf)
        return d <= ABS_TOL or d <= REL_TOL * max(abs(af), abs(bf))
    return str(a) == str(b)


def _sort_key_frame(df: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Row ordering must agree on both sides even when float cells
    differ in the last stabilized digit: sort PRIMARILY on the exact
    (int/string/bool/date) columns and only fall back to floats
    (rounded coarser than the tolerance) as trailing keys — two sides
    whose floats straddle a rounding boundary would otherwise sort
    into different row orders (round-11 ADVICE item)."""
    key = {}
    exact, floaty = [], []
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            key[c] = col.round(3)
            floaty.append(c)
        else:
            key[c] = col.astype(str)
            exact.append(c)
    return pd.DataFrame(key), sorted(exact) + sorted(floaty)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # decimals / dates fetched as objects -> normalize
            df[c] = df[c].map(
                lambda v: float(v)
                if type(v).__name__ == "Decimal"
                else v
            )
    if len(df):
        keys, order_cols = _sort_key_frame(df)
        order = keys.sort_values(by=order_cols, kind="mergesort").index
        df = df.loc[order]
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, rep_df: pd.DataFrame) -> list[str]:
    errs = []
    sc, rc = sorted(spark_df.columns), sorted(rep_df.columns)
    if sc != rc:
        return [f"columns differ: spark={sc} replay={rc}"]
    if len(spark_df) != len(rep_df):
        errs.append(f"rows differ: spark={len(spark_df)} replay={len(rep_df)}")
    s, r = canon(spark_df), canon(rep_df)
    n = min(len(s), len(r))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not _cell_match(s[c].iloc[i], r[c].iloc[i]):
                if bad < 5:
                    errs.append(
                        f"row {i} col {c}: spark={s[c].iloc[i]!r} "
                        f"replay={r[c].iloc[i]!r}"
                    )
                bad += 1
    if bad:
        errs.append(f"{bad} mismatched cells total")
    return errs


def check_constants() -> list[str]:
    """The replays redeclare production constants literally; a drifted
    constant must fail loudly, not silently diverge the comparison."""
    import replays as R

    from sandbox_data_pipeline_spark.queries import analytics as qana
    from sandbox_data_pipeline_spark.queries import text as qtext

    pairs = [
        ("COVERAGE_K", qtext),
        ("RHO_SELECT_PCT", qtext),
        ("ACF_MAX_LAG", qana),
        ("KM_HORIZON", qana),
        ("JK_GROUPS", qana),
        ("SINKHORN_BINS", qana),
        ("SINKHORN_ITERS", qana),
        ("SHAPLEY_CHANNELS", qana),
    ]
    from sandbox_data_pipeline_spark.operators import similarity as osim
    from sandbox_data_pipeline_spark.operators import sketch as osk
    from sandbox_data_pipeline_spark.queries import similarity as qsim
    from sandbox_data_pipeline_spark.queries import text as qt2

    pairs += [
        ("BURST_TOP", qt2),
        ("KMV_K", osk),
        ("DIM", qsim),
        ("TOPK", qsim),
        ("QUERY_MOD", qsim),
        ("N_CENTROIDS", qsim),
        ("NPROBE", qsim),
        ("KMEANS_ITER", qsim),
        ("NEAR_T", qsim),
        ("PQ_M", osim),
        ("PQ_K", osim),
    ]
    from sandbox_data_pipeline_spark.queries import dedup as qd

    for rname, pname, mod in [
        ("MINHASH_K", "K", qd),
        ("MINHASH_BANDS", "BANDS", qd),
        ("MINHASH_N", "MINHASH_N", qd),
        ("MINHASH_T", "MINHASH_T", qd),
        ("SIMHASH_BITS", "SIMHASH_BITS", qd),
        ("ALLPAIRS_T", "ALLPAIRS_T", qd),
        ("ALLPAIRS_N", "ALLPAIRS_N", qd),
        ("SPLIT_MOD", "SPLIT_MOD", qd),
        ("SPLIT_TRAIN", "SPLIT_TRAIN", qd),
        ("SPLIT_VAL", "SPLIT_VAL", qd),
        ("DBSCAN_EPS", "DBSCAN_EPS", qsim),
        ("DBSCAN_MINPTS", "DBSCAN_MINPTS", qsim),
    ]:
        pairs.append((rname, (mod, pname)))
    from sandbox_data_pipeline_spark.operators import text as otext
    from sandbox_data_pipeline_spark.queries import analytics as qana2
    from sandbox_data_pipeline_spark.queries import multimodal as qmm

    pairs += [
        ("LANG_MARKERS", otext),
        ("BPE_ISH_PATTERN", otext),
        ("CORR_COLS", qana2),
        ("IMAGE_BAND_CAP", qmm),
        ("VIDEO_BAND_CAP", qmm),
    ]
    pairs += [
        ("SPRT_P0", qana),
        ("SPRT_P1", qana),
        ("SPRT_ALPHA", qana),
        ("SPRT_BETA", qana),
        ("RDD_CUTOFF_C", qana),
        ("RDD_BW_C", qana),
        ("RBO_K", qtext),
        ("RBO_P", qtext),
        ("MI_TOPK", qtext),
        ("MAP_K", qtext),
        ("MAP_QUERIES", qtext),
        ("MAP_REL_TERM", qtext),
        ("DD_SUB", osk),
        ("EWMA_ALPHA", qana),
        ("CONF_ALPHA_NUM", qana),
        ("CONF_ALPHA_DEN", qana),
        ("ISO_BINS", qana),
        ("ISO_CENTS_PER_BIN", qana),
        ("SEQ_MINSUP_PCT", qana),
        ("POWER_MDE_PCT", qana),
        ("POWER_Z_ALPHA", qana),
        ("POWER_Z_BETA", qana),
        ("PPR_SEED_MOD", qd),
        ("PPR_ITER", qd),
        ("PPR_D", qd),
        ("BM25_TERMS", (qtext, "BM25_TERMS")),
        ("BM25_K", qtext),
        ("TEXTRANK_TOP", qtext),
        ("CMS_DEPTH", osk),
        ("CMS_WIDTH", osk),
        ("BFS_SEED_MOD", qd),
        ("BFS_MAX_HOPS", qd),
        ("PASSAGE_W", qd),
        ("WINNOW_K", qtext),
        ("WINNOW_W", qtext),
        ("FH_BUCKETS", qtext),
        ("SPLIT_RATIOS", (qtext, "SPLIT_RATIOS")),
        ("PLANES", qsim),
        ("KNN_QUERY_MOD", qsim),
        ("MATRYOSHKA_DIM", qsim),
        ("MMR_POOL", qsim),
        ("MMR_K", qsim),
        ("MMR_LAM", qsim),
        ("RRF_K", qsim),
        ("RRF_DEPTH", qsim),
        ("RRF_TOP", qsim),
        ("RRF_QUERY_VEC", qsim),
    ]
    from sandbox_data_pipeline_spark.operators import quality as oq
    from sandbox_data_pipeline_spark.queries import dq as qdq

    pairs += [
        ("UNIGRAM_PIECES2", qtext),
        ("UNIGRAM_PIECES3", qtext),
        ("UNIGRAM_VOCAB", (qtext, "UNIGRAM_VOCAB")),
        ("Q_SCALE", oq),
        ("Q_HALF", oq),
        ("Q_BUCKETS", oq),
        ("Q_NTOK", oq),
        ("Q_BIAS", oq),
        ("Q_NFEATS", oq),
        ("Q_LABEL_NUM", oq),
        ("Q_STEP_NUM", oq),
        ("Q_ITERS", oq),
        ("DOREMI_ITERS", oq),
        ("DOREMI_M0", oq),
        ("PCA_POWER_ITERS", qsim),
        ("PCA_Q_SCALE", qsim),
        ("PCA_V_SCALE", qsim),
        ("LOF_FLAG_X1E6", qsim),
        ("L_DIV_BUCKET", qdq),
        ("T_CLOSE_X10000", qdq),
        ("BPE_N_MERGES", qtext),
        ("BPE_MERGES", (qtext, "BPE_MERGES")),
        ("WP_TOPK", qtext),
        ("WP_MAXLEN", qtext),
        ("KMV_MAX", osk),
        ("WSAMPLE_K", qtext),
        ("JACCARD_N", qd),
        ("JACCARD_T", qd),
        ("JACCARD_DF_CAP", qd),
        ("CONTAIN_N", qd),
        ("CONTAIN_T", qd),
        ("SIMHASH_MAXH", qd),
        ("SUFFIX_DOC_MOD", qd),
        ("SUFFIX_MAX_LEN", qd),
        ("SUFFIX_MIN_LCP", qd),
        ("SUFFIX_TOP_K", qd),
        ("FS_ITERS", qd),
        ("FS_INIT", (qd, "FS_INIT")),
        ("STRATA_FRAC", qtext),
        ("PACK_BUDGET", qtext),
        ("SOURCE_QUOTA", qtext),
        ("TOKEN_BUDGET", qtext),
        ("MIX_ALPHA", qtext),
        ("MIX_SAMPLE_N", qtext),
        ("NEG_K", None),
        ("HARD_CEIL", qsim),
        ("EVAL_MOD", qd),
        ("DECONTAM_N", qd),
        ("NGRAM_N", qtext),
        ("NGRAM_TOP", qtext),
        ("SWEEP_THRESHOLDS", (qtext, "SWEEP_THRESHOLDS")),
        ("INDEX_TOP_TOKENS", qtext),
        ("PHRASE", (qtext, "PHRASE")),
        ("INCR_MOD", qsim),
        ("FUZZY_PREFIX", qd),
        ("FUZZY_BODY", qd),
        ("FUZZY_MAXD", qd),
        ("FUZZY_CAP", qd),
        ("BLOCKED_SOURCES", (qtext, "BLOCKED_SOURCES")),
        ("PII_MOD", qtext),
        ("EMAIL_PATTERN", otext),
        ("PHONE_PATTERN", otext),
        ("CASCADE_MIN_CHARS", qtext),
        ("CASCADE_MIN_TOKENS", qtext),
        ("CASCADE_LANGS", (qtext, "CASCADE_LANGS")),
        ("K_ANON", qdq),
        ("L_DIVERSITY", qdq),
        ("QUALITY_CUT", qtext),
    ]
    # wave-14 fixture-parity pins: the replay REGENERATES the
    # reference-parity fixture documents standalone; they must stay
    # byte-identical to the production fixtures module.
    from sandbox_data_pipeline_spark import fixtures as fx
    from sandbox_data_pipeline_spark import schemas as sch

    if R.R_CITIES != list(fx.CITIES):
        errs.append("R_CITIES != fixtures.CITIES")
    if R.R_RUN_HRS != list(fx.RUN_HRS):
        errs.append("R_RUN_HRS != fixtures.RUN_HRS")
    if [
        (c, h, j) for c, h, _d, j in R.r_weather_docs()
    ] != fx.weather_json_docs():
        errs.append("replay weather docs != fixtures.weather_json_docs()")
    if [
        (c, h, str(d)) for c, h, d, _j in R.r_weather_docs()
    ] != fx.weather_raw_docs():
        errs.append("replay weather raw != fixtures.weather_raw_docs()")
    if R.r_cocktails_raw() != fx.cocktails_raw():
        errs.append("replay cocktails raw != fixtures.cocktails_raw()")
    if R.r_cocktails_json() != fx.cocktails_json():
        errs.append("replay cocktails json != fixtures.cocktails_json()")
    if R.R_COCKTAIL_RENAME != sch.COCKTAIL_RENAME:
        errs.append("R_COCKTAIL_RENAME != schemas.COCKTAIL_RENAME")
    from sandbox_data_pipeline_spark.queries import layout as qlay

    pairs = [
        (("NEG_K", qlay) if p == ("NEG_K", None) else p) for p in pairs
    ]
    errs = []
    for cname, mod in pairs:
        if isinstance(mod, tuple):
            mod, pname = mod
        else:
            pname = cname
        if getattr(R, cname) != getattr(mod, pname):
            errs.append(
                f"constant drift: replays.{cname}={getattr(R, cname)} "
                f"!= production {getattr(mod, pname)}"
            )
    return errs


def check_goldens(spark=None) -> list[str]:
    """Feed the hand-built golden payloads (replays.GOLDENS — spec-
    derived bytes + hand-computed decodes) to the PRODUCTION decoders
    and compare. This is the only gate where decoder and encoder
    cannot share a bug: the payloads never touch the engine's
    encoders. Returns failure strings (empty = green)."""
    from replays import GOLDENS

    from sandbox_data_pipeline_spark.operators.jpeg import decode_jpeg
    from sandbox_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        decode_gif,
        decode_png,
    )
    from sandbox_data_pipeline_spark.operators.video import decode_avi

    decoders = {
        "bmp": decode_bmp,
        "png": decode_png,
        "gif": decode_gif,
        "jpeg": decode_jpeg,
        "avi": decode_avi,
    }
    errs: list[str] = []
    for kind, vectors in GOLDENS.items():
        for i, vec in enumerate(vectors):
            tag = f"golden:{kind}[{i}]"
            try:
                if kind == "audio_windows":
                    if spark is None:
                        continue  # Spark-surface golden; skipped if absent
                    got = _audio_windows_rows(spark, vec["payload"])
                    want = vec["expect"]["windows"]
                    if got != want:
                        errs.append(f"{tag}: windows {got} != {want}")
                    continue
                out = decoders[kind](vec["payload"])
                for key, want in vec["expect"].items():
                    got = out.get(key)
                    if isinstance(got, list) and got and isinstance(
                        got[0], tuple
                    ):
                        got = [tuple(p) for p in got]
                    if got != want:
                        errs.append(f"{tag}: {key} = {got!r}, want {want!r}")
            except Exception as e:  # noqa: BLE001
                errs.append(f"{tag}: {type(e).__name__}: {e}")
    return errs


def _audio_windows_rows(spark, payload: bytes) -> list[tuple]:
    """Drive the production segment_audio operator over one golden WAV
    row and return (window_idx, start_byte, n_bytes, start_ms)."""
    from sandbox_data_pipeline_spark.operators.multimodal import segment_audio

    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload))],
        "media_id: long, media_type: string, content: binary",
    )
    rows = segment_audio(df).collect()
    return [
        (r["window_idx"], r["start_byte"], r["n_bytes"], r["start_ms"])
        for r in sorted(rows, key=lambda r: r["window_idx"])
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import queries
    from sandbox_data_pipeline_spark.session import get_spark

    cerrs = check_constants()
    for e in cerrs:
        print(f"FAIL  <constants>: {e}")

    spark = get_spark("replay-check")
    spark.sparkContext.setLogLevel("ERROR")

    gerrs = check_goldens(spark) if not only else []
    for e in gerrs:
        print(f"FAIL  {e}")
    if not only and not gerrs:
        print("ok    <codec golden vectors>")

    qs = queries()
    t = Tables(sf_dir)
    failed = list(cerrs) + list(gerrs)
    n_ok = 0
    import time

    for name, fn in sorted(REPLAYS.items()):
        if only and name not in only:
            continue
        if name not in qs:
            print(f"FAIL  {name}: replay has no registry query")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            spark_pd = qs[name](spark, sf_dir).toPandas()
            rep_pd = fn(t)
            errs = compare(name, spark_pd, rep_pd)
        except Exception as e:  # noqa: BLE001
            errs = [f"{type(e).__name__}: {e}"]
        dt = time.time() - t0
        if errs:
            print(f"FAIL  {name} ({dt:.1f}s)")
            for e in errs:
                print(f"      {e}")
            failed.append(name)
        else:
            n_ok += 1
            print(f"ok    {name} ({dt:.1f}s)")
    print(f"\n{n_ok} ok, {len(failed)} failures")
    return len(failed)


if __name__ == "__main__":
    sys.exit(main())
