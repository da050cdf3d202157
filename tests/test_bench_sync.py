"""Mechanical bench <-> docs consistency (VERDICT r4 #8).

The r4 chained-Adam discrepancy (docs/scaling.md quoted 386 steps/s at
k=50 while BENCH_r04 recorded 172.1) went unnoticed because measured
numbers lived in two places with no tripwire. docs/scaling.md now carries
a machine-readable ledger (the ``BENCH-SYNC`` comment block next to the
measured table); this test validates every ledger line against the newest
driver-recorded ``BENCH_r*.json`` (or a ``scripts/out/bench_local.json``
written by a manual ``python bench.py`` run) that carries the metric.

Ledger line format (inside the comment block)::

    <metric> <documented-value> <rel-tol> <round>

- validated when a source at least as new as ``<round>`` has the metric;
- skipped (counted, not silently) when the newest source predates
  ``<round>`` — the number was measured this round and the driver's
  end-of-round bench will pick it up next round;
- a metric name unknown to ``bench.py`` fails loudly (typo tripwire).
"""

import json
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent

_LEDGER_RE = re.compile(r"<!-- BENCH-SYNC.*?\n(.*?)-->", re.DOTALL)


def _ledger():
    text = (ROOT / "docs" / "scaling.md").read_text()
    m = _LEDGER_RE.search(text)
    assert m, "docs/scaling.md must carry a BENCH-SYNC ledger block"
    line_re = re.compile(
        r"^([a-z0-9_]+)\s+([-0-9.e]+)\s+([0-9.]+)\s+(\d+)$"
    )
    entries = []
    for line in m.group(1).strip().splitlines():
        lm = line_re.match(line.strip())
        if lm:  # Prose/comment lines inside the block are ignored.
            entries.append(
                (
                    lm.group(1),
                    float(lm.group(2)),
                    float(lm.group(3)),
                    int(lm.group(4)),
                )
            )
    return entries


def _sources():
    """metric -> (round, value) from the newest source per metric."""
    out = {}

    def feed(rnd, suite):
        for k, v in suite.items():
            if isinstance(v, (int, float)) and (
                k not in out or out[k][0] <= rnd
            ):
                out[k] = (rnd, float(v))

    for p in sorted(ROOT.glob("BENCH_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        try:
            data = json.loads(p.read_text())
        except Exception:
            continue
        suite = ((data.get("parsed") or {}).get("suite")) or {}
        feed(rnd, suite)
    local = ROOT / "scripts" / "out" / "bench_local.json"
    if local.exists():
        data = json.loads(local.read_text())
        feed(int(data.get("round", 0)), data.get("suite", {}))
    return out


def test_docs_measured_numbers_match_bench():
    entries = _ledger()
    assert entries, "BENCH-SYNC ledger is empty"
    sources = _sources()
    bench_src = (ROOT / "bench.py").read_text()
    problems, pending = [], []
    for metric, doc_val, tol, rnd in entries:
        # Typo tripwire: the metric must be a literal bench.py key or
        # already recorded by some round (f-string-templated keys).
        assert f'"{metric}"' in bench_src or metric in sources, (
            f"BENCH-SYNC metric {metric!r} is not produced by bench.py"
        )
        if metric not in sources or sources[metric][0] < rnd:
            pending.append(metric)  # Measured this round; checked next.
            continue
        _, val = sources[metric]
        if abs(doc_val - val) > tol * max(abs(val), 1e-12):
            problems.append(
                f"{metric}: docs say {doc_val}, bench recorded {val} "
                f"(tol {tol:.0%})"
            )
    assert not problems, "docs/scaling.md disagrees with bench:\n" + "\n".join(
        problems
    )
    # Every ledger line should become checkable within one round; a
    # ledger where NOTHING is checkable is miswired.
    assert len(pending) < len(entries), (pending, sources.keys())
