"""Run bench.py once and append one JSON line pairing the result with
the host load average before/after — the r7 VERDICT #6 protocol: only
runs STARTED on a quiet host (1-min pre-load <= 0.5) are flagged
"quiet" for the comparison series (post-load is always high — the
bench itself saturates 32 cores); everything else is recorded but
marked noisy.

Every run is also compared per-query against the quiet reference
minima (the newest sweeps/r{N}_headline_minima.json present); queries
above 1.2x their reference are printed.  Per the protocol a query is a
SUSPECTED regression only if it exceeds 1.2x in BOTH of two
quiet-start runs — one flagged run is information, not a verdict.

Usage: python tools/bench_paired.py [out.jsonl]
"""
import json
import os
import subprocess
import sys
import time


def loadavg():
    with open("/proc/loadavg") as f:
        a, b, c = f.read().split()[:3]
    return [float(a), float(b), float(c)]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "sweeps/r10_bench_runs.jsonl"
    if not os.path.isabs(out_path):
        # resolve against the repo root (same dir the bench subprocess
        # runs in), not the caller's CWD — invoking from elsewhere used
        # to append to a stray sweeps/ or crash
        out_path = os.path.join(repo, out_path)
    pre = loadavg()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd=repo,
    )
    post = loadavg()
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not json_lines:
        rec = {
            "ts": int(t0), "load_pre": pre, "load_post": post,
            "quiet": pre[0] <= 0.5, "error": proc.returncode,
            "stderr_tail": proc.stderr[-2000:],
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({"error": proc.returncode}))
        sys.exit(1)
    bench = json.loads(json_lines[-1])
    rec = {
        "ts": int(t0),
        "load_pre": pre,
        "load_post": post,
        # the bench itself saturates 32 cores, so post-load is always
        # high; quiet means the HOST was idle when the run started
        "quiet": pre[0] <= 0.5,
        **bench,
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in ("ts", "load_pre", "load_post", "quiet", "metric", "value")}))
    # per-query check vs the quiet reference minima (BASELINE.md r10);
    # the newest round's minima file wins — references only ratchet
    # DOWN (stricter), they are re-anchored UP only for a documented
    # semantics change (the r9 corpus_pipeline precedent)
    # newest-first fallback chain: a checkout missing the newest minima
    # file compares against the next-newest, never silently the loosest
    # r13: the canonical live reference (sweeps/headline_minima.json,
    # ratcheted down by tools/ratchet_minima.py) wins when present; the
    # r{N} chain remains as the fallback for older checkouts
    ref_path = os.path.join(repo, "sweeps", "headline_minima.json")
    if not os.path.exists(ref_path):
        ref_path = None
        for rnd in range(20, 8, -1):
            cand = os.path.join(repo, "sweeps", f"r{rnd}_headline_minima.json")
            if os.path.exists(cand):
                ref_path = cand
                break
        ref_path = ref_path or os.path.join(repo, "sweeps", "r9_headline_minima.json")
    if os.path.exists(ref_path) and isinstance(rec.get("queries"), dict):
        ref = json.load(open(ref_path))
        over = {
            q: {"run": round(t, 3), "ref": ref[q],
                "ratio": round(t / ref[q], 2)}
            for q, t in rec["queries"].items()
            if q in ref and ref[q] > 0 and t > 1.2 * ref[q]
        }
        print(json.dumps({"over_1.2x_ref": over, "quiet": rec["quiet"]}))


if __name__ == "__main__":
    main()
