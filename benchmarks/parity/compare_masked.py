"""Summarize the masked-Pendulum recurrent/transformer parity campaign:
per-seed final-quarter mean episode reward + envelope verdict (the same rule
as PARITY_CURVES.md), plus seed-averaged curves for the appendix."""

from __future__ import annotations

import json
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_masked"
SEEDS = (1, 2, 3, 4, 5)


def reward_series(path):
    rows = [json.loads(line) for line in open(path)]
    series = []
    for r in rows:
        for key in ("Metric/episode_reward", "Environment/episode_reward"):
            if key in r:
                series.append((r["iteration"], r[key]))
                break
    return series


def final_quarter(series):
    vals = [v for _, v in series]
    tail = vals[3 * len(vals) // 4 :]
    return sum(tail) / max(len(tail), 1)


def averaged_curve(all_series, points=16):
    n = min(len(s) for s in all_series)
    idx = [int(i * (n - 1) / (points - 1)) for i in range(points)]
    return [
        (all_series[0][i][0], round(sum(s[i][1] for s in all_series) / len(all_series)))
        for i in idx
    ]


def main():
    for algo in ("recurrent", "transformer", "transformer_post"):
        print(f"\n## Masked Pendulum — {algo}")
        stats = {}
        for impl in ("ref", "ours"):
            finals, curves = [], []
            for seed in SEEDS:
                file_algo = "transformer" if (algo == "transformer_post" and impl == "ref") else algo
                path = os.path.join(OUT, f"{impl}_{file_algo}_s{seed}.jsonl")
                if not os.path.exists(path):
                    continue
                series = reward_series(path)
                finals.append(final_quarter(series))
                curves.append(series)
            if not finals:
                continue
            stats[impl] = (finals, (min(finals), max(finals)))
            name = "reference" if impl == "ref" else "cusrl_tpu"
            per_seed = ", ".join(f"s{s}: {v:.1f}" for s, v in zip(SEEDS, finals))
            print(f"| {name} | {per_seed} | [{min(finals):.1f}, {max(finals):.1f}] |")
            if curves:
                print(f"  curve ({name}): {averaged_curve(curves)}")
        if len(stats) == 2:
            (rf, renv), (of, oenv) = stats["ref"], stats["ours"]
            overlap = not (oenv[1] < renv[0] or oenv[0] > renv[1])
            ours_better = min(of) >= min(rf)
            verdict = "MATCH" if (overlap or ours_better) else "MISMATCH"
            print(f"  Verdict: {verdict} (ref envelope {renv}, ours {oenv})")


if __name__ == "__main__":
    main()
