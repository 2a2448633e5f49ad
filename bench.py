"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver records only the last 2000 bytes of stdout (VERDICT r9 #1:
`parsed: null` since r5 because the full record outgrew that window),
so the FINAL stdout line is a compact summary — total, sf, top-level
entry timings (no dotted variant keys), probe summary — kept under
1500 bytes. The full record (dotted variants, run_log, comparability
keys, outlier re-runs, raw probes) is written straight to the
canonical per-round name BENCH_r{N}_local.json — N auto-detected
from the newest driver artifact (VERDICT r10 #5: the old scheme
wrote BENCH_local.json and relied on a manual copy, so a round could
end with two overlapping records and the next round's comparable-slot
detection reading the stale one). Same-round refreshes overwrite in
place: ONE record file per round. Override with
$SPARK_GRAFT_BENCH_OUT (scale runs use BENCH_sf{X}_r{N}.json).

Each query is forced end-to-end with the noop sink (full compute, no
driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family; extended as the surface grows.
BENCH_QUERIES = [
    "pricing_summary",
    "flagship_revenue",
    "top_orders",
    "outer_join_agg",
    "two_tier_lookup",
    "grouping_multi",
    "window_running",
    "window_rank",
    "session_windows",
    "asof_join",
    "dedup_exact",
    "near_dup_jaccard",
    "near_dup_hash",
    "near_dup_embedding",
    "dedup_clusters",
    "tfidf_terms",
    "cosine_topk",
    "ann_variants",
    "event_windows",
    "dist_stats",
    "text_metrics",
    "json_props",
    "range_join_events",
    "stats_moments",
    "salted_agg",
    "trade_analytics",
    "subquery_counts",
    "statement_pipeline",
    "vendor_enrich",
    "merge_upsert",
    "date_spine",
    "array_battery",
    # r10: the remaining registry entries — the bench now times the
    # FULL 50-entry driver surface (the ones below are mostly cheap
    # relational/scalar batteries plus the multimodal family, which
    # had no timed slot at all before)
    "approx_sketches",
    "big_orders",
    "coa_codes",
    "distinct_agg",
    "excel_projection",
    "filter_battery",
    "multimodal_features",
    "multimodal_meta",
    "pivot_wide",
    "scalar_battery",
    "semi_anti_join",
    "setops",
    "string_battery2",
    "top_customer_per_nation",
    "unpivot_measures",
    "vector_stats",
    "window_lag",
    "window_ntile",
]


def detect_round(here: Path) -> int:
    """The CURRENT round number = newest driver-written artifact + 1.

    The driver commits BENCH_r{N}.json / CORRECTNESS_r{N}.json at the
    END of round N, so during round N+1 the newest such file is rN.
    $SPARK_GRAFT_ROUND overrides (and is how tests pin it). Falls back
    to 0 (record name BENCH_r0_local.json) when no artifact exists —
    still one deterministic file, never a floating BENCH_local.json."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env and env.isdigit():
        return int(env)
    newest = 0
    for pat in (r"BENCH_r(\d+)\.json", r"CORRECTNESS_r(\d+)\.json"):
        for p in here.glob("*.json"):
            m = re.fullmatch(pat, p.name)
            if m:
                newest = max(newest, int(m.group(1)))
    return newest + 1 if newest else 0


def compact_line(out: dict, detail_ref: str) -> str:
    """The driver-facing final stdout line (<= ~1400 bytes measured;
    hard guard below 1900 so a 2000-byte stdout tail ALWAYS parses —
    the r5-r9 records were `parsed: null` because the full record
    outgrew that window). "queries" carries only top-level entries,
    rounded to 2 decimals; dotted variant keys, run logs and raw
    probes live in the detail file."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {
            k: round(v, 2)
            for k, v in out["queries"].items()
            if "." not in k
        },
        "sf": out["sf"],
        "n_slots": len(out["queries"]),
        "n_errors": len(out.get("errors", {})),
        "n_outlier_reruns": len(out["outlier_reruns"]),
        "probe_spark_job_ms": [
            out["host_probe"][k].get("spark_job_ms")
            for k in ("start", "end")
        ],
        "detail": detail_ref,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # paranoia: never outgrow the tail window
        compact["queries"] = dict(
            sorted(
                compact["queries"].items(),
                key=lambda kv: kv[1],
                reverse=True,
            )[:10]
        )
        compact["queries_truncated_to_top10"] = True
        line = json.dumps(compact, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    errors: dict[str, str] = {}

    # Warm the JVM + parquet footers once so timings measure the queries.
    try:
        qs[names[0]].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass  # the per-query loop will record the failure

    # Each query runs three times and reports the fastest pass:
    # steady-state throughput, not whole-stage-codegen compilation
    # (a per-plan one-time cost that dominates at these tiny local
    # SFs) and not scheduler jitter (fixture-bound plans vary ±50%
    # between passes under load).
    #
    # Per-query failure isolation (round-3 lesson: one AnalysisException
    # at plan-build time aborted the whole bench and lost the round's
    # entire performance signal): a failing query records an error row
    # and the run continues; rc is nonzero only above a failure
    # threshold.
    # The two noisiest slots (iterative CC rounds, ANN index builds —
    # TODO.md documents 2-3x host-noise swings) report the MEDIAN of
    # five passes so round-over-round comparisons stop chasing noise;
    # everything else reports the best of three (steady-state).
    NOISY_RUNS = {"dedup_clusters": 5, "ann_variants": 5}
    run_log: dict[str, dict] = {}

    def best_of(name: str, fn, runs: int = 3) -> float | None:
        samples: list[float] = []
        for _ in range(runs):
            try:
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                return None
        stat = "median" if name in NOISY_RUNS else "best"
        run_log[name] = {"samples": samples, "stat": stat}
        if stat == "median":
            return sorted(samples)[len(samples) // 2]
        return min(samples)

    # objective host-speed datum embedded IN the record (VERDICT r8
    # Next #1): a uniform round-over-round move that tracks the probe
    # ratio is host drift, not code — readable from this file alone
    from tools.host_probe import probe_host

    host_probe = {"start": probe_host(spark)}

    timings: dict[str, float] = {}
    for name in names:
        t = best_of(name, qs[name].fn, runs=NOISY_RUNS.get(name, 3))
        if t is not None:
            timings[name] = t
    for name in names:
        if name in timings and qs[name].variants:
            for vname, vfn in qs[name].variants.items():
                t = best_of(f"{name}.{vname}", vfn, runs=2)
                if t is not None:
                    timings[f"{name}.{vname}"] = t

    # Outlier re-run rule (VERDICT r8 Next #1 — the r8 record carried
    # a phantom event_windows 28.9 s that re-measured at 9.1 s): an
    # entry whose recorded best exceeds BOTH its prior-round value x2
    # AND its own dotted-variant sum x2 was almost certainly timed
    # under transient load; it gets ONE fresh re-run at session end
    # (the box has quiesced by then) and the record keeps both
    # readings plus the min. Entries without variants or without a
    # prior-round value are skipped (no second signal to corroborate).
    prior: dict[str, float] = {}
    prev_round = 0
    here = Path(__file__).resolve().parent
    # newest prior full record wins (the BENCH_r{N}_local.json series;
    # the driver-side BENCH_r{N}.json files are truncated transcripts)
    candidates = sorted(
        (
            (int(m.group(1)), p)
            for p in here.glob("BENCH_r*_local.json")
            if (m := re.match(r"BENCH_r(\d+)_local\.json", p.name))
        ),
        reverse=True,
    )
    for n, path in candidates:
        try:
            prior = {
                k: v
                for k, v in json.loads(path.read_text())[
                    "queries"
                ].items()
                if isinstance(v, (int, float))
            }
            prev_round = n
            break
        except (OSError, ValueError, KeyError, TypeError):
            continue
    # The re-run repeats the ORIGINAL best_of policy (same runs, same
    # stat — ADVICE r9: a one-shot rerun silently swapped a median-of-5
    # statistic for a single pass) and appends its samples to run_log,
    # so the recorded value always carries the stat its samples imply.
    outlier_reruns: dict[str, dict] = {}
    for name in names:
        if name not in timings or name not in prior:
            continue
        vsum = sum(
            v
            for k, v in timings.items()
            if k.startswith(name + ".")
        )
        if vsum <= 0:
            continue
        initial = timings[name]
        if initial > 2 * prior[name] and initial > 2 * vsum:
            initial_log = run_log.get(name)
            rerun = best_of(
                name, qs[name].fn, runs=NOISY_RUNS.get(name, 3)
            )
            if rerun is None:  # keep the initial reading on failure
                errors.pop(name, None)
                run_log[name] = initial_log
                continue
            # best_of replaced run_log[name] with the rerun samples;
            # keep the initial reading's samples beside them
            if initial_log is not None:
                run_log[name]["initial_samples"] = initial_log[
                    "samples"
                ]
            outlier_reruns[name] = {"initial": initial, "rerun": rerun}
            timings[name] = min(initial, rerun)

    host_probe["end"] = probe_host(spark)

    # the total counts only top-level entries (the driver-comparable
    # set); dotted sub-keys time each union-tagged variant separately
    # so merged entries stay comparable across rounds
    total = round(
        sum(v for k, v in timings.items() if "." not in k), 3
    )

    # Round-over-round comparability contract (VERDICT r5 #7): entry
    # totals absorb new variants every round and must never be diffed
    # across rounds; the dotted per-variant keys are the comparable
    # unit. comparable_to_prev lists exactly the dotted keys present
    # in the previous round's record whose implementation did NOT
    # change this round — the judge diffs those and nothing else.
    CHANGED_THIS_ROUND = {
        # r12 optimization round — dotted slots whose implementation
        # (plan or job graph) changed; entry totals are never compared.
        # BM25 family: one checkpointed _bm25_tf shared by the ranking
        # and releval's labels; standalone bm25/hybrid/releval now
        # checkpoint tf / accept the shared ranking
        "tfidf_terms.bm25",
        "tfidf_terms.hybrid",
        "tfidf_terms.releval",
        # drift's ppm totals now derive from the pre-aggregated
        # (source, token, tf) counts (token_ppm_from_counts)
        "tfidf_terms.drift",
        # cosine family: _bounded_cosines checkpoints (cos, norms) —
        # every consumer re-reads one materialization
        "near_dup_embedding.pairs",
        "near_dup_embedding.semdedup",
        "near_dup_embedding.decontam",
        "near_dup_embedding.contrast",
        "near_dup_embedding.ivf",
        # resolve_entities: per-name counts ride the rep aggregation,
        # cluster sizes summed on the name table, ONE record-sized join
        "dedup_clusters.entity",
        # kmeans_quantized checkpoints the quantized frame (1
        # materialization instead of ~2·iters evaluations); k_core in
        # fixed-iters mode drops the per-round count actions
        "dist_stats.kmeans",
        "dist_stats.kcore",
        # prefix_sum's / linear_fill's bounded windows now partition
        # on a constant-valued non-foldable key (WindowExec warning
        # fix) — same rows, new exchange
        "dist_stats.pack",
        "dist_stats.budget",
        "date_spine.interp",
        # incr checkpoints are eager now (cluster-mode single-render
        # guarantee, ADVICE r11) — job graph changed
        "near_dup_hash.incr",
    }
    # the driver's BENCH_r{N}.json truncates the JSON into a "tail"
    # string; the builder's own BENCH_r{N}_local.json holds the full
    # record — take whichever parses (prior already loaded above for
    # the outlier rule; reuse it for the comparable-key set)
    prev_keys = {k for k in prior if "." in k}
    comparable = sorted(
        (prev_keys & set(timings)) - CHANGED_THIS_ROUND
    )

    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": run_log,
        # self-describing: the round of the newest prior local record
        # this run's comparable keys and outlier priors came from
        f"comparable_to_r{prev_round}": comparable,
        "host_probe": host_probe,
        "outlier_reruns": outlier_reruns,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
        out["ok_queries"] = len([n for n in names if n in timings])

    # Full record → file (never stdout: it blew the driver's 2000-byte
    # tail window from r5 on).
    detail_path = Path(
        os.environ.get(
            "SPARK_GRAFT_BENCH_OUT",
            str(here / f"BENCH_r{detect_round(here)}_local.json"),
        )
    )
    try:
        detail_path.write_text(json.dumps(out, indent=1))
        detail_ref = detail_path.name
    except OSError as exc:
        detail_ref = f"unwritable: {exc}"[:80]

    # Compact summary as the FINAL stdout line (see compact_line).
    print(compact_line(out, detail_ref))
    # a handful of broken queries cost their rows, not the round's
    # signal; fail the run only when most of the suite is broken
    if len(errors) > len(names) // 2:
        sys.exit(1)


if __name__ == "__main__":
    main()
