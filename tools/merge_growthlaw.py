#!/usr/bin/env python3
"""Assemble the growth-law artifact from per-query ScaleLaw .jsonl files
(tools/bench_scale.sh, round 15: one fresh JVM per query per scale point,
each JVM appending its one-query JSON line — or an explicit failure
record — incrementally, so an interrupted leg keeps everything it
measured).

Usage: merge_growthlaw.py <out.json> <sf01.jsonl> <sf1.jsonl> <sf3.jsonl>

Per point, the LAST record per query wins (a retry after a failure row
supersedes it). Exponents e(a->b) = log(t_b/t_a)/log(sb/sa) are fitted
for every adjacent pair of points where both times exist; failed queries
carry their per-query error record instead of a fabricated number (the
r14 lesson: the dying single-JVM leg recorded 5 ms "times" for queries
whose execution had thrown)."""
import json, math, sys

def load(path):
    qs = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                qs.update(rec["queries"])
    except FileNotFoundError:
        pass
    return qs

def expo(ta, tb, sa, sb):
    if ta is None or tb is None or ta <= 0 or tb <= 0:
        return None
    return round(math.log(tb / ta) / math.log(sb / sa), 3)

def main():
    out_path = sys.argv[1]
    pts = [("sf0.1", 0.1, sys.argv[2]),
           ("sf1",   1.0, sys.argv[3]),
           ("sf3",   3.0, sys.argv[4])]
    data = [(n, sf, load(p)) for n, sf, p in pts]
    have = [(n, sf, d) for n, sf, d in data if d]
    assert len(have) >= 2, "need at least two completed points"

    names = sorted({q for _, _, d in have for q in d})
    out, failures = {}, []
    for q in names:
        rec = {"sec": {}, "rows": {}, "e_time": {}}
        for n, sf, d in have:
            r = d.get(q)
            if r is None:
                continue
            rec["sec"][n] = None if r["sec"] is None else round(r["sec"], 3)
            rec["rows"][n] = r["rows"]
            if r.get("err"):
                rec.setdefault("err", {})[n] = r["err"]
                failures.append(f"{q}@{n}:{r['err']}")
        for (na, sa, da), (nb, sb, db) in zip(have, have[1:]):
            key = f"{na.replace('sf','')}->{nb.replace('sf','')}"
            ta = da.get(q, {}).get("sec")
            tb = db.get(q, {}).get("sec")
            rec["e_time"][key] = expo(ta, tb, sa, sb)
        # seconds per output row, when output itself grows superlinearly:
        # the honest exponent for pair-emitting queries on the clone
        # fixture (k shards make k^2 true pairs per original dup group)
        r0 = have[0][2].get(q, {}).get("rows")
        rn = have[-1][2].get(q, {}).get("rows")
        span = have[-1][1] / have[0][1]
        if r0 and rn and r0 > 0 and rn > r0 * span:
            rec["e_per_row"] = {}
            for (na, sa, da), (nb, sb, db) in zip(have, have[1:]):
                key = f"{na.replace('sf','')}->{nb.replace('sf','')}"
                a, b = da.get(q, {}), db.get(q, {})
                ta, ra = a.get("sec"), a.get("rows")
                tb, rb = b.get("sec"), b.get("rows")
                if ta and tb and ra and rb and ra > 0 and rb > 0:
                    rec["e_per_row"][key] = expo(ta / ra, tb / rb, sa, sb)
        out[q] = rec

    missing = [n for n, _, p in pts if n not in [h[0] for h in have]]
    note = ("round-15: one fresh JVM per query per scale point (the "
            "single-JVM 30-query sf3 leg OOM-died three times; per-query "
            "isolation makes one OOM cost one row and names the query by "
            "construction), all points at 32 cores, full noop-write "
            "execution, min-of-2 after a warm pass that builds the query's "
            "own SessionCache artifacts — timed-pass semantics unchanged "
            "vs the r13 single-JVM points, so exponents are comparable. "
            "Shuffle partitions sized for data volume (32/64/128). Set "
            "grows to 32: adds q_fleiss_kappa and q_cochran_q (the honest "
            "sf1 suite's #2 cost and its artifact sibling, previously "
            "never measured isolated). Failed/timed-out queries carry "
            "explicit per-query err records, never fabricated times."
            + (" Completed points: " + "/".join(h[0] for h in have)
               + "; MISSING: " + ",".join(missing)
               + " - bench_scale.sh resumes skip-if-complete."
               if missing else "")
            + ((" FAILURES: " + "; ".join(failures)) if failures else ""))
    json.dump({"queries": out, "note": note}, open(out_path, "w"), indent=1)
    print("wrote", out_path, "points:", [h[0] for h in have],
          "failures:", failures or "none")

if __name__ == "__main__":
    main()
