"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Per-query timing is end-to-end: plan construction + execution to a count/
collect action (results are small aggregates or bounded row sets; we force
full materialization without shipping megabytes to the driver by counting
where the result is large).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from comp5339dataengineering_realtimefuelanalysis_spark.session import get_spark
from comp5339dataengineering_realtimefuelanalysis_spark.functions.caching import (
    release_tracked,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry import (
    CANONICAL_ORDER,
    REGISTRY,
)
from comp5339dataengineering_realtimefuelanalysis_spark.plans.registry_llm import (
    release_ivf_indexes,
)

# Timings must be comparable ACROSS rounds: iterate the registry in its
# fixed definition order, not the attestation-rotated order the driver
# sees. The r15->r16 record showed emb_ivf_topk_probes2 (plan unchanged)
# swinging 0.9 -> 1.87 s raw purely because the rotation moved it away
# from the neighbors that warm the shared IVF index materialization and
# the embeddings parquet page cache.
BENCH_ITEMS = [(name, REGISTRY[name]) for name in CANONICAL_ORDER]


def _steal_sample() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu line —
    sampled before/after a run, the delta attributes wall-clock inflation
    to hypervisor CPU steal instead of leaving it a mystery number."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:  # noqa: BLE001 — not Linux / unreadable
        return None


def streaming_bench(spark) -> dict:
    """End-to-end streaming throughput: land deterministic envelope files,
    run the full pipeline (clean + quarantine + silver append + dedup +
    live Q1) to completion, report rows/sec through the cleaned path.

    The r11->r13 driver artifacts showed 17.4k -> 16.5k -> 13.7k rows/s
    normalized while controlled quiet-epoch runs measured a best-ever
    18.0k — single-shot timings on this VM swing with steal bursts that
    last tens of seconds.  Hardened (r14): 2x the streamed rows (the
    window now spans ~8-12 s), and each attempt carries its measured
    steal%% so the artifact alone explains any cross-round trend."""
    import shutil
    import tempfile

    from comp5339dataengineering_realtimefuelanalysis_spark.streaming.runners import (
        FuelStreamingPipeline,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    n_files, prices_per, stations_per = 40, 2500, 50
    fuels = ["U91", "E10", "P98", "DL", "P95"]
    for fi in range(n_files):
        prices = [
            {
                "stationcode": str(100 + (fi * prices_per + i) % 500),
                "fueltype": fuels[i % len(fuels)],
                "price": f"{100 + (i * 7) % 150}.{i % 10}",
                "lastupdated": f"{1 + (fi * 7 + i) % 28:02d}/10/2023 "
                f"{i % 24:02d}:{i % 60:02d}:00",
            }
            for i in range(prices_per)
        ]
        stations = [
            {
                "brandid": "B1",
                "stationid": f"S{fi}-{i}",
                "brand": "Ampol",
                "code": str(100 + (fi * stations_per + i) % 500),
                "name": f"Station {i}",
                "address": f"{i} Main St",
                "location": {"latitude": -33.0 - i * 0.01,
                             "longitude": 151.0 + i * 0.01},
            }
            for i in range(stations_per)
        ]
        with open(os.path.join(landing, f"poll_{fi:08d}.json"), "w") as f:
            json.dump({"stations": stations, "prices": prices}, f,
                      separators=(",", ":"))

    pipe = FuelStreamingPipeline(
        spark,
        landing_dir=landing,
        warehouse_dir=os.path.join(tmp, "wh"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        q1_table="bench_q1_live",
    )
    s0 = _steal_sample()
    t0 = time.perf_counter()
    queries = pipe.start()
    try:
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()
    dt = time.perf_counter() - t0
    s1 = _steal_sample()
    steal_pct = None
    if s0 and s1 and s1[1] > s0[1]:
        steal_pct = round(100.0 * (s1[0] - s0[0]) / (s1[1] - s0[1]), 2)
    n_rows = n_files * (prices_per + stations_per)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "input_rows": n_rows,
        "sec": round(dt, 4),
        "rows_per_sec": round(n_rows / dt, 1),
        "steal_pct": steal_pct,
    }


def streaming_attempts_gated(spark) -> dict:
    """The steal-gated streaming measurement (hardened r16/r17): keep
    retrying (at most 6 attempts) until at least TWO attempts ran at
    <5% measured steal; headline min and median are then taken over
    the low-steal attempts only (all attempts stay in the artifact for
    attribution). If the host never offers two quiet windows, fall
    back to all attempts and say so via n_low_steal. Hosts where steal
    is unmeasurable (steal_pct None) use the pre-r17 two-attempt gate
    instead of always burning all 6 attempts."""

    def _low_steal(a: dict) -> bool:
        return a.get("steal_pct") is not None and a["steal_pct"] < 5.0

    attempts = [streaming_bench(spark)]
    while len(attempts) < 6:
        n_low = sum(1 for a in attempts if _low_steal(a))
        best = min(attempts, key=lambda a: a["sec"])
        steal_measurable = any(
            a.get("steal_pct") is not None for a in attempts
        )
        if (
            len(attempts) >= 2
            and (n_low >= 2 or not steal_measurable)
            and best["sec"] < 12.0
        ):
            break
        attempts.append(streaming_bench(spark))
    pool = [a for a in attempts if _low_steal(a)] or attempts
    streaming = dict(min(pool, key=lambda a: a["sec"]))
    secs = sorted(a["sec"] for a in pool)
    mid = len(secs) // 2
    med = (
        secs[mid]
        if len(secs) % 2
        else round((secs[mid - 1] + secs[mid]) / 2, 4)
    )
    streaming["median_sec"] = med
    streaming["median_rows_per_sec"] = round(
        streaming["input_rows"] / med, 1
    )
    streaming["n_low_steal"] = len(
        [a for a in attempts if _low_steal(a)]
    )
    streaming["attempts"] = [
        {k: a[k] for k in ("sec", "rows_per_sec", "steal_pct")}
        for a in attempts
    ]
    return streaming


# In-epoch calibration (round 9): the round-8 host-epoch control
# (SCALE_MEASURED.json: r8_host_epoch_control) proved this VM drifts
# 2-3x BETWEEN bench epochs on long many-job chains while short queries
# reproduce to +-0.05 s — so raw cross-round comparison of the heavy
# queries is unattributable. Each epoch therefore starts with a fixed
# 3-probe calibration (one short single-shuffle agg, one shuffle-heavy
# banded self-join, one long many-job iterative chain), min-of-3
# against floors recorded in the round-8 epoch at sf0.1. The geometric
# mean of the ratios is the epoch's slowdown factor; the artifact
# carries raw seconds AND factor-normalized values so a later reader
# can separate host drift from plan changes.
# r19: doc_lsh_verified_pairs / doc_dedup_clusters became warm at-rest
# cache reads in r18 (_verified_pairs_for), so their r8 floors measured a
# computation the probe no longer runs — cal_factor collapsed 1.2964 ->
# 0.3854 and every factor-normalized r18 number was invalid (VERDICT r18
# #1). Replaced with two CACHE-FREE probes of the same taxonomy
# (shuffle-heavy join; long many-job iterative chain). Their floors are
# r8-EQUIVALENT, chained through the one unchanged probe: in each of TWO
# quiet epochs (tools/record_cal_floors.py, r19) each new probe's
# min-of-5 was divided by that epoch's avg_by_type drift ratio
# (min-of-5 / 0.1845) and the two back-casts averaged (they agreed
# within 5%: contamination 1.1068/1.1623, kmeans 1.3943/1.4146), so the
# triple still normalizes against the r8 host epoch.
CALIBRATION_REFS = {
    "avg_by_type": 0.1845,        # short: one small shuffle (r8 floor)
    "doc_contamination": 1.1346,  # shuffle-heavy inverted-index join
    "emb_kmeans_train": 1.4045,   # long many-job iterative Lloyd chain
}
CALIBRATION_REF_EPOCH = "r8_sf0.1 (contamination/kmeans floors chained via avg_by_type, r19)"


def calibration_probe(spark, sf_dir: str, sf: str) -> dict:
    import math

    probes: dict[str, dict] = {}
    for name, ref in CALIBRATION_REFS.items():
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        runs: list[float] = []
        for _ in range(3):
            try:
                t0 = time.perf_counter()
                qd.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 4))
            except Exception:  # noqa: BLE001 — probe loss ≠ bench loss
                pass
            finally:
                release_tracked()
        if runs:
            probes[name] = {
                "ref_sec": ref,
                "sec": min(runs),
                "runs": runs,
                "ratio": round(min(runs) / ref, 4),
            }
    factor = None
    # reference floors are sf0.1 values: at any other sf the ratios mix
    # host drift with data scaling and normalization would lie
    if probes and sf == "0.1":
        factor = round(
            math.exp(
                sum(math.log(p["ratio"]) for p in probes.values())
                / len(probes)
            ),
            4,
        )
    return {
        "probes": probes,
        "factor": factor,
        "ref_epoch": CALIBRATION_REF_EPOCH,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    if os.environ.get("SPARK_GRAFT_STREAM_ONLY") == "1":
        # subprocess mode: a fresh JVM runs ONLY the gated streaming
        # measurement and prints its dict as the sole stdout JSON line
        # (see the dedicated-process rationale at the call site)
        spark = get_spark("bench_stream")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            print(json.dumps(streaming_attempts_gated(spark)))
        except Exception as exc:  # noqa: BLE001
            print(json.dumps(
                {"err": f"{type(exc).__name__}: {exc}"[:500]}
            ))
        spark.stop()
        return
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every query once at the smallest scale factor. Janino
    # caches generated classes by source, so this pre-pays whole-stage
    # codegen compilation (measured 5-8 s on the widest expressions) and
    # Python-worker startup; the timed sf runs then measure the queries,
    # not first-touch JIT. Falls back silently if the warm dir is absent.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for qd in REGISTRY.values():
            try:
                qd.fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
        release_tracked()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    calibration = calibration_probe(spark, sf_dir, sf)

    # Each query is timed as the MIN of independent materializations.
    # This host is a VM with bursty CPU steal (sampled up to 16% of all
    # cores for tens of seconds): a single-shot timing randomly inflates
    # whichever queries a burst lands on by 3-10x. The min of runs spaced
    # a full registry apart bounds that distortion; it measures the plan,
    # not the neighbor. Queries whose min after two passes is still >1 s
    # get a THIRD run: the r5->r6 record showed unchanged >1 s plans
    # swinging +-50% on min-of-2, too noisy to separate drift from
    # regression. All raw runs are kept in the artifact so a later reader
    # can attribute any cross-round delta (run spread = host noise; a
    # shifted floor = the plan changed).
    all_runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def _one_run(name, qd) -> None:
        # Fault-isolated: one failing query records its error and the
        # run keeps timing the rest — a single regression must never
        # zero the whole round's benchmark signal.
        try:
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            # noop datasource: materializes EVERY output column without
            # sink cost — count() would let Catalyst prune computed
            # columns and measure only the scan on map-only queries
            df.write.format("noop").mode("overwrite").save()
            all_runs.setdefault(name, []).append(
                round(time.perf_counter() - t0, 4)
            )
            # a pass-1 failure followed by a pass-2 success is a timed
            # query, not an errored one — keep the two sets disjoint
            errors.pop(name, None)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            # release the frames THIS query persisted (plan builders
            # register them via functions/caching.py) — explicit
            # ownership instead of a blanket clearCache; leaked blocks
            # would otherwise accumulate and evict each other mid-run
            release_tracked()

    # r19 accounting fix (VERDICT r18 #1): the shared at-rest
    # materializations (_ivf_index_dir families: IVF index, verified
    # pairs, DSIR scores, simhash, lang/quality profile, SQ8 codes) are
    # DROPPED at every pass boundary, so each pass pays each family's
    # one-time build exactly once — charged to the family's first
    # consumer in canonical order — and min-of-passes compares two
    # honest build-inclusive runs. Before r19 the build landed in the
    # discarded first pass and ~10 queries reported warm parquet-read
    # latency (the r18 VERDICT counted that as measurement gaming; the
    # old-methodology numbers live in bench_out_r18.json /
    # bench_out_r19.json for comparison).
    for _pass in range(2):
        for name, qd in BENCH_ITEMS:
            _one_run(name, qd)
        release_ivf_indexes()
    for name, qd in BENCH_ITEMS:
        if name in all_runs and min(all_runs[name]) > 1.0:
            _one_run(name, qd)

    timings = {name: min(runs) for name, runs in all_runs.items()}
    total = round(sum(timings.values()), 4)
    release_ivf_indexes()
    # The streaming measurement runs in a DEDICATED fresh process
    # (r18). The r14->r17 raw decline (28.3k -> 9.5k rows/s) was
    # attributed by tools/ab_stream_position.py in a quiet-steal
    # window: host steal is the dominant term (10-14% steal inflates
    # the wall 3-6x; at ~0% steal the fresh-session best was 33.2k
    # rows/s, best ever), but running LAST in a JVM that just executed
    # the full registry costs a further ~10% (post/fresh best 1.099 at
    # equal steal, heap 1.6 -> 5.9 GB). A dedicated process removes
    # the position term entirely and makes the artifact a pure
    # streaming-path + host-condition measurement. Falls back to
    # in-process attempts if the subprocess fails for any reason.
    streaming = None
    try:
        import subprocess

        env = dict(os.environ)
        env["SPARK_GRAFT_STREAM_ONLY"] = "1"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                streaming = json.loads(line)
                streaming["isolated_process"] = True
                break
    except Exception:  # noqa: BLE001 — fall back to in-process below
        streaming = None
    if streaming is None:
        try:
            streaming = streaming_attempts_gated(spark)
            streaming["isolated_process"] = False
        except Exception as exc:  # noqa: BLE001
            streaming = {"err": f"{type(exc).__name__}: {exc}"[:500]}
    out = {
        "metric": "registry_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": all_runs,
        "streaming": streaming,
        "calibration": calibration,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if calibration.get("factor"):
        f = calibration["factor"]
        out["value_normalized"] = round(total / f, 4)
        out["queries_normalized"] = {
            k: round(v / f, 4) for k, v in timings.items()
        }
        # streaming rows/s scales INVERSELY with the host slowdown
        # factor: normalized = raw * factor (r9/r10 verdicts had to do
        # this arithmetic by hand; carry it in the artifact instead)
        if "rows_per_sec" in streaming:
            streaming["rows_per_sec_normalized"] = round(
                streaming["rows_per_sec"] * f, 1
            )
            streaming["sec_normalized"] = round(
                streaming["sec"] / f, 4
            )
        if "median_rows_per_sec" in streaming:
            streaming["median_rows_per_sec_normalized"] = round(
                streaming["median_rows_per_sec"] * f, 1
            )
    if errors:
        # permanently-failing queries shrink the total silently; the
        # explicit count keeps cross-round total comparisons honest
        out["errors"] = errors
        out["n_failed"] = len(errors)
    # The stdout JSON line is the driver contract, but the driver records
    # only a ~2000-char tail of stdout (BENCH_r05/r06 both truncated the
    # head of the line -> parsed: null). Persist the FULL artifact to a
    # file, then print a COMPACT line (2-dp timings, no separators
    # whitespace, streaming summarized, error names only) sized to fit the
    # tail window. Path overridable so concurrent runs don't clobber the
    # committed artifact; default is gitignored.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_out.json"),
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"bench: full artifact written to {out_path}", file=sys.stderr)
    # Cross-round attribution (tools/bench_compare.py) needs FULL
    # artifacts from BOTH rounds, but bench_out.json is overwritten
    # every run and BENCH_r{N}.json keeps only a stdout tail. Infer the
    # round this run belongs to from the driver's committed BENCH_r*.json
    # ledger (max N + 1: the driver writes BENCH_r{N} AFTER running this)
    # and persist a per-round copy the next round can commit and compare
    # against. Only for the default path — explicit SPARK_GRAFT_BENCH_OUT
    # runs are ad-hoc experiments, not round artifacts.
    if "SPARK_GRAFT_BENCH_OUT" not in os.environ:
        try:
            import re as _re

            here = os.path.dirname(os.path.abspath(__file__))
            rounds = [
                int(m.group(1))
                for fn in os.listdir(here)
                for m in [_re.match(r"BENCH_r(\d+)\.json$", fn)]
                if m
            ]
            rnd = (max(rounds) if rounds else 0) + 1
            per_round = os.path.join(here, f"bench_out_r{rnd:02d}.json")
            with open(per_round, "w") as f:
                json.dump(out, f, indent=1)
            print(
                f"bench: per-round artifact written to {per_round}",
                file=sys.stderr,
            )
        except OSError:
            pass
    compact = {
        "metric": out["metric"],
        "value": round(total, 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "streaming": {
            k: streaming[k]
            for k in ("sec", "rows_per_sec", "rows_per_sec_normalized",
                      "median_rows_per_sec", "n_low_steal",
                      "steal_pct", "err")
            if k in streaming
        },
        "sf": out["sf"],
    }
    if calibration.get("factor"):
        compact["cal_factor"] = calibration["factor"]
        compact["value_normalized"] = round(
            out["value_normalized"], 2
        )
    if errors:
        compact["n_failed"] = len(errors)
        compact["failed"] = sorted(errors)
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # the driver keeps only a ~2000-char stdout tail; a longer line
        # loses its HEAD (r5/r6 both recorded parsed: null). 1-dp timings
        # buy ~70 chars per hundred queries; the full-precision record
        # lives in the file artifact either way.
        compact["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
