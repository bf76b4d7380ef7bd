"""Assemble the round-4 HP-search report (GP arm + random control arm).

Reads outputs/hp_hard/report_gp.json and outputs/hp_hard_random/
report_random.json (whichever exist), compares best-so-far trajectories
at equal trial counts, and writes docs/results/hp_search_r4_report.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = {}
    gp_p = os.path.join(REPO, "outputs", "hp_hard", "report_gp.json")
    rd_p = os.path.join(REPO, "outputs", "hp_hard_random",
                        "report_random.json")
    gp = json.load(open(gp_p)) if os.path.exists(gp_p) else None
    rd = json.load(open(rd_p)) if os.path.exists(rd_p) else None
    out["gp"] = gp
    out["random"] = rd
    if gp and rd and gp["best_so_far"] and rd["best_so_far"]:
        n = min(len(gp["best_so_far"]), len(rd["best_so_far"]))
        out["equal_budget_comparison"] = {
            "trials": n,
            "gp_best_at_n": gp["best_so_far"][n - 1],
            "random_best_at_n": rd["best_so_far"][n - 1],
            "gp_wins": gp["best_so_far"][n - 1] >= rd["best_so_far"][n - 1],
        }
    dst = os.path.join(REPO, "docs", "results", "hp_search_r4_report.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    json.dump(out, open(dst, "w"), indent=1)
    print("->", dst)
    if "equal_budget_comparison" in out:
        print(json.dumps(out["equal_budget_comparison"], indent=1))


if __name__ == "__main__":
    main()
