#!/usr/bin/env python3
"""Cross-round bench regression triage.

Diffs per-query MIN timings between two bench artifacts and flags
movers (>1.5x either direction), annotating each with whether any
source file in the query's module changed between the rounds — the
question a bench swing always raises is "did the code move or the
machine?", and this answers the code half mechanically.

Inputs are either round numbers (loads BENCH_r{NN}.json from the repo
root) or paths to files holding a raw Bench JSON line. Driver
artifacts keep only the LAST 2000 chars of the bench line ("tail"),
so early queries in the spread map are absent — those are reported as
not-comparable rather than silently skipped.

Usage:
  tools/benchdiff.py 7 8             # diff BENCH_r07 -> BENCH_r08
  tools/benchdiff.py 8 /tmp/b.json   # diff r08 -> a local Bench line
  tools/benchdiff.py --chain 6 7 8   # consecutive diffs, one report

Re-measuring a flagged mover locally:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=w1_event_windows,dedup_simhash_pairs \
  sbt -batch "runMain graft.Bench" | grep '"metric"' > /tmp/b.json
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPREAD_RE = re.compile(
    r'"([A-Za-z0-9_#]+)":\{"min":([0-9.eE+-]+),"max":([0-9.eE+-]+),"runs":(\d+)\}')
FLAG = 1.5  # |ratio| beyond this (either direction) is a mover

# query-name prefix -> the main-source files whose changes could move it.
# SparkEntry.scala (query definitions) is checked separately for every
# query since it changes nearly every round.
G = "src/main/scala/graft"
MODULES = [
    (r"^(dedup_|pipeline_)", [f"{G}/llm/Dedup.scala", f"{G}/llm/TextAnalysis.scala",
                              f"{G}/llm/Sampling.scala", f"{G}/functions/MinHashAgg.scala",
                              f"{G}/functions/SimHashAgg.scala"]),
    (r"^sim_", [f"{G}/llm/Similarity.scala", f"{G}/llm/Ivf.scala",
                f"{G}/functions/IvfFns.scala", f"{G}/functions/ArrayFns.scala"]),
    (r"^vec_", [f"{G}/functions/ArrayFns.scala"]),
    (r"^sketch_", [f"{G}/llm/Sketch.scala"]),
    (r"^text_", [f"{G}/llm/TextAnalysis.scala"]),
    (r"^sample_", [f"{G}/llm/Sampling.scala"]),
    (r"^decontam_", [f"{G}/llm/Decontam.scala", f"{G}/llm/Dedup.scala",
                     f"{G}/functions/ArrayFns.scala"]),
    (r"^mine_", [f"{G}/llm/Similarity.scala", f"{G}/functions/ArrayFns.scala"]),
    (r"^vocab_overlap", [f"{G}/llm/Drift.scala", f"{G}/llm/TextAnalysis.scala"]),
    (r"^bpe_fertility", [f"{G}/llm/TextAnalysis.scala", f"{G}/functions/BpeFns.scala"]),
    (r"^doc_length_outliers", [f"{G}/ops/Outliers.scala"]),
    (r"^curation_funnel", [f"{G}/llm/Selection.scala", f"{G}/llm/TextAnalysis.scala"]),
    (r"^mm_", [f"{G}/llm/Multimodal.scala", f"{G}/functions/BinaryFns.scala"]),
    (r"^w[0-9]_", [f"{G}/streaming/StreamingIngest.scala"]),
    (r"^asof_", [f"{G}/ops/AsOf.scala"]),
    (r"^range_", [f"{G}/ops/RangeJoin.scala"]),
    (r"^skew_", [f"{G}/ops/Skew.scala"]),
    (r"^event_outliers", [f"{G}/ops/Outliers.scala"]),
    (r"^event_trend", [f"{G}/ops/Trend.scala"]),
    (r"^er_", [f"{G}/ops/EntityRes.scala", f"{G}/llm/Dedup.scala"]),
    (r"^graph_", [f"{G}/ops/Graph.scala"]),
    (r"^session_concurrency", [f"{G}/ops/Sweep.scala", f"{G}/streaming/StreamingIngest.scala"]),
    (r"^profile_", [f"{G}/ops/Profile.scala"]),
    (r"^j5_", [f"{G}/io/Bucketing.scala"]),
    (r"^engine_", [f"{G}/engine/Engine.scala", f"{G}/io/ConfigReader.scala",
                   f"{G}/io/Xlsx.scala", f"{G}/parse/Conditions.scala"]),
    (r"^s[0-9]+_", [f"{G}/io/NestedStore.scala", f"{G}/io/Ingestion.scala",
                    f"{G}/io/EventStore.scala"]),
    # operator-family queries all route through Ops + the condition parser
    (r"^(a[0-9]_|c[0-9]+_|f[0-9]_|j[0-9]_|p[0-9]_|r[0-9]_)",
     [f"{G}/ops/Ops.scala", f"{G}/parse/Conditions.scala"]),
]
SHARED = [f"{G}/plans/GraftExtensions.scala", f"{G}/Bench.scala"]


def module_files(query):
    for pat, files in MODULES:
        if re.match(pat, query):
            return files
    return []


def parse_artifact(spec):
    """Round number or path -> (label, {query: (min, max, runs)}, truncated?)."""
    if re.fullmatch(r"\d+", str(spec)):
        path = os.path.join(REPO, f"BENCH_r{int(spec):02d}.json")
        label = f"r{int(spec):02d}"
    else:
        path, label = spec, os.path.basename(spec)
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
        text = doc["tail"] if isinstance(doc, dict) and "tail" in doc else raw
        truncated = isinstance(doc, dict) and "tail" in doc
    except json.JSONDecodeError:
        text, truncated = raw, False
    entries = {m.group(1): (float(m.group(2)), float(m.group(3)), int(m.group(4)))
               for m in SPREAD_RE.finditer(text)}
    if not entries:
        sys.exit(f"benchdiff: no per-query spread entries found in {path}")
    return label, entries, truncated


def round_code_commit(label):
    """Commit whose tree the bench measured: the parent of the driver's
    'round N: verdict/...' artifact commit (bench runs before it)."""
    m = re.fullmatch(r"r(\d+)", label)
    if not m:
        return None
    n = int(m.group(1))
    out = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"],
        capture_output=True, text=True).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith(f"round {n}: verdict"):
            return sha + "^"
    return None


def changed_files(commit_a, commit_b):
    if not commit_a or not commit_b:
        return None
    out = subprocess.run(
        ["git", "-C", REPO, "diff", "--name-only", commit_a, commit_b],
        capture_output=True, text=True)
    return None if out.returncode else out.stdout.split()


def sparkentry_changed_lines(commit_a, commit_b):
    """The +/- lines of SparkEntry's diff — SparkEntry changes almost
    every round, so 'SparkEntry changed' only matters for a query whose
    own definition is inside the changed lines."""
    if not commit_a or not commit_b:
        return ""
    out = subprocess.run(
        ["git", "-C", REPO, "diff", "-U0", commit_a, commit_b,
         "--", f"{G}/SparkEntry.scala"],
        capture_output=True, text=True)
    if out.returncode:
        return ""
    return "\n".join(l for l in out.stdout.splitlines()
                     if l.startswith(("+", "-")) and not l.startswith(("+++", "---")))


def diff(spec_a, spec_b):
    (la, ea, ta), (lb, eb, tb) = parse_artifact(spec_a), parse_artifact(spec_b)
    code_a, code_b = round_code_commit(la), round_code_commit(lb)
    changed = changed_files(code_a, code_b)
    entry_diff = sparkentry_changed_lines(code_a, code_b)
    common = sorted(set(ea) & set(eb))
    only = (set(ea) | set(eb)) - set(common)
    rows, movers = [], []
    for q in common:
        amin, amax, _ = ea[q]
        bmin, bmax, _ = eb[q]
        ratio = bmin / amin if amin else float("inf")
        flagged = ratio > FLAG or ratio < 1 / FLAG
        note = ""
        if flagged:
            base = q.split("#")[0]
            if changed is None:
                note = "module-diff unavailable"
            else:
                hits = [f for f in module_files(base) + SHARED if f in changed]
                if f'"{base}"' in entry_diff:
                    hits.append(f"{G}/SparkEntry.scala (this query's definition)")
                note = ("CODE CHANGED: " + ", ".join(hits)) if hits else \
                    "module untouched -> environment noise unless reproduced"
            # overlapping [min,max] bands across rounds are themselves
            # evidence of noise, not regression
            if amin <= bmax and bmin <= amax:
                note += "; min/max bands overlap"
        rows.append((q, amin, amax, bmin, bmax, ratio, flagged, note))
        if flagged:
            movers.append(q)
    lines = [f"## {la} -> {lb}", ""]
    if ta or tb:
        lines.append(f"_Driver artifacts keep only the bench line's last 2000 chars; "
                     f"{len(only)} quer{'y is' if len(only) == 1 else 'ies are'} not in both "
                     f"artifacts and were skipped: {', '.join(sorted(only)) or 'none'}._")
        lines.append("")
    suma = sum(ea[q][0] for q in common)
    sumb = sum(eb[q][0] for q in common)
    lines.append(f"Sum of mins over {len(common)} common queries: "
                 f"{suma:.2f}s -> {sumb:.2f}s ({sumb / suma:.2f}x). "
                 f"Movers (>{FLAG}x either way): {len(movers)}.")
    lines.append("")
    lines.append("| query | min A | min B | ratio | verdict |")
    lines.append("|---|---|---|---|---|")
    for q, amin, amax, bmin, bmax, ratio, flagged, note in rows:
        if not flagged:
            continue
        lines.append(f"| {q} | {amin:.3f} (max {amax:.3f}) | {bmin:.3f} (max {bmax:.3f}) "
                     f"| {ratio:.2f}x | {note} |")
    if not movers:
        lines.append("| _none_ | | | | |")
    lines.append("")
    return "\n".join(lines)


def main():
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    if args[0] == "--chain":
        specs = args[1:]
        if len(specs) < 2:
            sys.exit(__doc__)
        out = [diff(a, b) for a, b in zip(specs, specs[1:])]
        print("\n".join(out))
    else:
        if len(args) < 2:
            sys.exit(__doc__)
        print(diff(args[0], args[1]))


if __name__ == "__main__":
    main()
