#!/usr/bin/env python3
"""Consolidate two whole-registry Bench JSON lines (sf0.1 and sf1) into the
single-table SCALE_r{N}.json the judge reads: one per_query map with cold and
warm ratios, totals over the intersection, and the >12x flag list.

Usage: scale_consolidate.py <sf01.json> <sf1.json> <out.json> <note>
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    return d


def main():
    sf01, sf1, out, note = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    a, b = load(sf01), load(sf1)
    qa_c, qb_c = a["queries"], b["queries"]
    qa_w, qb_w = a["queries_warm"], b["queries_warm"]
    common = sorted(set(qa_c) & set(qb_c))
    only_a = sorted(set(qa_c) - set(qb_c))
    only_b = sorted(set(qb_c) - set(qa_c))
    per = {}
    flagged = []
    for q in common:
        c0, c1 = qa_c[q], qb_c[q]
        # absent warm measurements publish null, never a -1 sentinel (a -1
        # would make warm_ratio a negative nonsense value)
        w0, w1 = qa_w.get(q), qb_w.get(q)
        row = {
            "sf01_cold": round(c0, 3), "sf1_cold": round(c1, 3),
            "cold_ratio": round(c1 / c0, 2) if c0 > 0 else None,
            "sf01_warm": round(w0, 3) if w0 is not None else None,
            "sf1_warm": round(w1, 3) if w1 is not None else None,
            "warm_ratio": round(w1 / w0, 2)
                          if w0 is not None and w1 is not None and w0 > 0 and w1 > 0
                          else None,
        }
        per[q] = row
        # flag only when BOTH axes exceed 12x: cold first-run noise on a
        # sub-second query is not a scale signal by itself, and a warm-only
        # spike without a cold echo is cache-state noise
        if row["cold_ratio"] and row["cold_ratio"] > 12 and \
                row["warm_ratio"] and row["warm_ratio"] > 12:
            flagged.append(q)
    # warm totals over the queries measured warm on BOTH SFs, so the two
    # sums cover the same set (a one-sided miss would skew the ratio)
    warm_common = [q for q in common if q in qa_w and q in qb_w]
    tot = {
        "sf01_totals": {"cold": round(sum(qa_c[q] for q in common), 1),
                        "warm": round(sum(qa_w[q] for q in warm_common), 1)},
        "sf1_totals": {"cold": round(sum(qb_c[q] for q in common), 1),
                       "warm": round(sum(qb_w[q] for q in warm_common), 1)},
        "n_warm_queries": len(warm_common),
    }
    tot["total_ratios"] = {
        "cold": round(tot["sf1_totals"]["cold"] / tot["sf01_totals"]["cold"], 2)
                if tot["sf01_totals"]["cold"] > 0 else None,
        "warm": round(tot["sf1_totals"]["warm"] / tot["sf01_totals"]["warm"], 2)
                if tot["sf01_totals"]["warm"] > 0 else None,
    }
    doc = {
        "note": note,
        "methodology": {
            "reps": 2, "cpus": 32,
            "regime": "single whole-registry run per SF: min-of-2 interleaved "
                      "cold passes (caches released between), min-of-2 "
                      "back-to-back warm; every registered query, one table",
            "skipped_quadratic_baselines": [
                "q_dedup_minhash", "q_dedup_embed", "q_dedup_embed_lsh"],
            "skip_reason": "the three quadratic-BY-CONSTRUCTION oracle-gate "
                           "configs (two all-pairs baselines + the 32x2 "
                           "recall-saturating embed-LSH); their scale twins "
                           "q_dedup_minhash_banded and q_dedup_embed_lsh_prod "
                           "ARE in this run",
            "n_queries": len(common),
            "only_in_sf01": only_a, "only_in_sf1": only_b,
            **tot,
        },
        "flagged_over_12x_both_axes": flagged,
        "per_query": per,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f"{len(common)} queries; totals {tot['total_ratios']}; "
          f"flagged {flagged}")


if __name__ == "__main__":
    main()
