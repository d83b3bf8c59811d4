"""Compare two BENCH_DETAIL.json records: per-query cold/warm deltas,
CALIB-NORMALIZED against each record's fixed-work host-speed probes —
the round-over-round perf review the judge does by hand, as a tool.

Raw wall-clock on these hosts drifts ±30-40% across hours with no repo
change (SURVEY §6 r12), and r12→r13 cold read as a 1.28× "regression"
purely because the r13 host ran the fixed pre-cold probe 4.8× slower.
So every ratio printed here is divided by the matching-phase calib
factor first: cold ratios by calib_pre.spark_ms(new)/calib_pre.spark_ms
(old), warm ratios by the calib_post pair (the probes bracket the cold
and warm passes respectively). Records predating the calib fields
(≤ r11) fall back to factor 1.0 with a warning.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N]
"""

from __future__ import annotations

import json
import sys

# a normalized per-query warm ratio above this, with an absolute delta
# that matters, is a real regression — not host noise
REGRESSION_RATIO = 1.3
REGRESSION_ABS_S = 0.3


def _calib_factor(old: dict, new: dict, phase: str) -> "tuple[float, bool]":
    """spark_ms(new)/spark_ms(old) for `phase` ('calib_pre' for the
    cold pass, 'calib_post' for warm). Returns (factor, measured)."""
    try:
        return new[phase]["spark_ms"] / old[phase]["spark_ms"], True
    except (KeyError, TypeError, ZeroDivisionError):
        return 1.0, False


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    old, new = (json.load(open(p)) for p in args[:2])
    ow, nw = old["queries_warm"], new["queries_warm"]
    oc, nc = old["queries"], new["queries"]
    common = sorted(set(ow) & set(nw))
    added = sorted(set(nw) - set(ow))
    removed = sorted(set(ow) - set(nw))

    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: different scale factors ({old.get('sf')} vs "
            f"{new.get('sf')}) — ratios compare different workloads"
        )
    f_cold, cold_measured = _calib_factor(old, new, "calib_pre")
    f_warm, warm_measured = _calib_factor(old, new, "calib_post")
    if not (cold_measured and warm_measured):
        print("NOTE: calib probes missing in one record — raw ratios only")
    # the probe→workload transfer is only trustworthy NEAR 1x: a probe
    # that lands in a co-tenancy spike overstates the host delta (the
    # fixed 50M-row range-sum is more contention-sensitive than the
    # mixed query set), so a far-from-1 factor must not mint per-query
    # regression verdicts — it can only excuse or un-excuse totals.
    confident = (
        cold_measured
        and warm_measured
        and 0.7 <= f_warm <= 1.4
        and max(f_cold, f_warm) / max(min(f_cold, f_warm), 1e-9) <= 2.0
    )
    if not confident:
        print(
            "NOTE: host factors are far from 1x or phase-divergent — one "
            "probe likely ran on a transiently-contended host; normalized "
            "numbers are low-confidence, the verdict below is withheld in "
            "favor of raw ratios; prefer an interleaved same-session A/B"
        )
    print(
        f"host factor (new/old spark_ms): cold-phase {f_cold:.2f}  "
        f"warm-phase {f_warm:.2f}"
    )

    print(f"common {len(common)}  added {len(added)}  removed {len(removed)}")
    ow_t, nw_t = sum(ow[k] for k in common), sum(nw[k] for k in common)
    oc_t, nc_t = sum(oc[k] for k in common), sum(nc[k] for k in common)
    print(
        f"warm total (common): {ow_t:7.2f} -> {nw_t:7.2f}"
        f"  raw {nw_t / ow_t:4.2f}x  calib-norm {nw_t / ow_t / f_warm:4.2f}x"
    )
    print(
        f"cold total (common): {oc_t:7.2f} -> {nc_t:7.2f}"
        f"  raw {nc_t / oc_t:4.2f}x  calib-norm {nc_t / oc_t / f_cold:4.2f}x"
    )

    # rank by NORMALIZED warm ratio — the raw delta sort buried real
    # regressions under host-noise spikes and vice versa. A query whose
    # OLD warm rounded to 0 but is now measurably slow must rank first,
    # not be pinned to 1.0 (r14 review).
    def _ratio(k: str) -> float:
        if ow[k] > 0:
            return nw[k] / ow[k] / f_warm
        return float("inf") if nw[k] > REGRESSION_ABS_S else 1.0

    rows = sorted(((_ratio(k), k) for k in common), key=lambda x: -x[0])
    print(f"\ntop {top} by calib-normalized warm ratio:")
    for r, k in rows[:top]:
        # a 0-second OLD warm has no defined raw ratio — print n/a, not
        # 0.00x (which read as a massive improvement on what _ratio
        # correctly ranks as a new regression)
        raw = f"{nw[k] / ow[k]:4.2f}x" if ow[k] else " n/a"
        print(f"  {k:40s} {ow[k]:6.2f} -> {nw[k]:6.2f}  raw {raw}  norm {r:4.2f}x")

    if not confident:
        raw_reg = [
            (k, nw[k] / ow[k] if ow[k] > 0 else float("inf"))
            for k in common
            if (nw[k] / ow[k] > REGRESSION_RATIO if ow[k] > 0 else True)
            and nw[k] - ow[k] > REGRESSION_ABS_S
        ]
        print(
            "\nVERDICT (low confidence — raw, host factors unusable): "
            + (
                ", ".join(f"{k} {r:.2f}x" for k, r in raw_reg)
                if raw_reg
                else "no raw warm regressions either"
            )
        )
    else:
        regressions = [
            (k, r)
            for r, k in rows
            if r > REGRESSION_RATIO
            and (nw[k] - ow[k] * f_warm) > REGRESSION_ABS_S
        ]
        if regressions:
            print(
                f"\nVERDICT: {len(regressions)} real warm regression(s) "
                f"after host normalization (> {REGRESSION_RATIO}x and "
                f"> {REGRESSION_ABS_S}s): "
                + ", ".join(f"{k} {r:.2f}x" for k, r in regressions)
            )
        else:
            print(
                "\nVERDICT: no real warm regressions after host "
                "normalization — residual deltas are host noise"
            )
    if added:
        print("\nadded:", {k: nw[k] for k in added})
    if removed:
        print("removed:", sorted(removed))


if __name__ == "__main__":
    main()
