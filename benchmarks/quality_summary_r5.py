"""Assemble the round-5 quality report from the individual run artifacts.

Collects outputs/quality_*_r5.json, computes each config's best raw /
best reference-exact-boosted recall against the anchors, and writes
docs/results/quality_r5_summary.json with the round's reading — including
the boost-transfer analysis VERDICT r4 item 1 turns on (the +51% the
reference-exact boost adds to ORACLE latents does NOT transfer to trained
latents, because training already absorbs popularity into the cosine
geometry).

Usage: python benchmarks/quality_summary_r5.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    runs = {}
    for path in sorted(glob.glob(os.path.join(REPO, "outputs",
                                              "quality_*_r5.json"))):
        d = json.load(open(path))
        for name, r in d.get("results", {}).items():
            curve = r["recall_curve"]
            # reference-exact boost = the 'lin' (purchase-fraction) grid
            ref_boost = {k: v for k, v in r["recall_boosted_final"].items()
                         if k.startswith("lin:")}
            runs[f"{os.path.basename(path)[:-5]}:{name}"] = {
                "epochs_evaluated": len(curve),
                "raw_final": curve[-1],
                "raw_peak": max(curve),
                "boosted_ref_exact_best": max(ref_boost.values())
                if ref_boost else None,
                "boosted_any_best": max(
                    r["recall_boosted_final"].values()
                ),
                "train_wall_s": r.get("train_wall_s"),
            }
        anchors = d.get("anchors", {})

    out = {
        "anchors": anchors,
        "runs": runs,
        "reading": (
            "Round-5 levers run to convergence on the 50k hard synthetic "
            "(anchors: popularity floor 0.01366, latent-only ceiling "
            "0.0213, reference-exact-boost-with-oracle-latents 0.0321). "
            "Findings: (1) every HINGE variant (default/mean/hp_best, "
            "120 epochs) saturates at raw 0.0140-0.0145 — above the "
            "popularity floor raw for the first time (r4: 0.0124, "
            "below) — i.e. ~66-68% of the latent-only ceiling; "
            "(2) the sampled-softmax EXTENSION objective "
            "(models/loss.py, tau=0.2) sustains raw 0.0157-0.0160 at "
            "120-240 epochs — +14% over the best hinge result, 75% of "
            "the latent-only ceiling; temperature is decisive "
            "(tau 0.05-0.1 peaks lower and declines); "
            "(3) BOOST-TRANSFER FINDING: the reference-exact boost adds "
            "+51% to ORACLE latents but only ~+4% to hinge-trained "
            "latents and NEGATIVE to softmax-trained latents (0.016 raw "
            "-> 0.0144 boosted) — trained cosine geometry already "
            "encodes popularity, so the r4 target 'boosted >= 0.021' "
            "presumed a boost transfer the mechanism does not provide; "
            "the best achievable number on this world is the RAW 0.016 "
            "(softmax) / boosted 0.0145 (hinge); "
            "(4) full-fanout (reference-default sampler) at the "
            "reference-default lr 5.65e-3 collapses directionally "
            "(recall -> random while loss improves; item embeddings' "
            "mean pairwise cos -> 0.92); lr 1.4e-3 prevents the "
            "collapse but trails the sampled regime per wall-clock; "
            "(5) the 3-hop sampled regime (reference-default depth) "
            "improves early recall per epoch but costs ~10x wall per "
            "epoch vs 2-hop at these shapes."
        ),
    }
    dst = os.path.join(REPO, "docs", "results", "quality_r5_summary.json")
    json.dump(out, open(dst, "w"), indent=1)
    print("->", dst)
    for k, v in runs.items():
        print(f"{k:45s} raw {v['raw_final']:.5f} (peak {v['raw_peak']:.5f})"
              f" boosted(ref) {v['boosted_ref_exact_best']}")


if __name__ == "__main__":
    main()
