"""Guards against the round-5 driver-environment oracle failure mode.

CORRECTNESS_r05 lost three probe rows to DuckDB OutOfMemoryException: the
driver's verify process holds a live Spark JVM (~56k of the kernel's
65530 vm.max_map_count mmap budget), and a recursive-CTE closure oracle
at DuckDB's default 32 threads allocated enough blocks to tip the process
over the map limit. The fix (plans/parity_llm._closure_ctes) replaced the
recursion with bounded, MATERIALIZED min-label-propagation rounds and the
overweight probes were split by measured cost (scripts/measure_oracle.py).

These tests keep that fixed:

* no window oracle may contain a recursive CTE;
* the unrolled closure's iteration bound is PROVEN at sf0.01: one extra
  propagation round must already be a fixpoint (if a fixture dup-graph
  ever grows past diameter _CLOSURE_ITERS+1, this fails before the
  driver's hash compare does);
* the heavy closure oracles run to completion in a fresh subprocess at
  DEFAULT DuckDB threads (no `SET threads=8` mitigation) within a map
  budget that leaves the driver's JVM headroom intact.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

import pytest

import mrf_etl_spark.plans.parity_llm as pllm
from mrf_etl_spark.plans.parity_fused import DRIVER_WINDOW, ordered_registry

SF_001 = "/root/testdata/sf0.01"

# Maps the driver process can still afford for one oracle: the JVM side
# was measured at ~56-59k of the 65530 limit, so a single DuckDB
# statement must stay well under the remaining ~6k.
MAP_BUDGET = 5000

_MAP_WORKER = r"""
import os, sys, threading, time
import duckdb

sql = sys.stdin.read()
peak = [0]
stop = threading.Event()

def watch():
    while not stop.is_set():
        with open(f"/proc/{os.getpid()}/maps") as fh:
            n = sum(1 for _ in fh)
        peak[0] = max(peak[0], n)
        time.sleep(0.01)

base = sum(1 for _ in open(f"/proc/{os.getpid()}/maps"))
t = threading.Thread(target=watch, daemon=True)
t.start()
con = duckdb.connect()  # DEFAULT threads — the driver's configuration
for tbl in ("region nation customer supplier part orders lineitem events "
            "documents embeddings").split():
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sys.argv[1]}/{tbl}.parquet')")
con.sql("SET enable_progress_bar=false")
rows = len(con.sql(sql).fetchall())
stop.set()
t.join()
print(f"{rows} {peak[0] - base}")
"""


def test_no_window_oracle_uses_recursive_cte():
    reg = ordered_registry()
    offenders = [
        n
        for n in DRIVER_WINDOW
        if reg[n].oracle and re.search(r"\bRECURSIVE\b", reg[n].oracle, re.I)
    ]
    assert not offenders, f"recursive CTE back in window oracles: {offenders}"


_SCALE_DIRS = [
    p
    for p in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        str(Path(__file__).resolve().parents[1] / ".scale" / "sf1"),
    )
    if (Path(p) / "documents.parquet").is_file()
]


@pytest.mark.parametrize(
    "sf_dir", _SCALE_DIRS, ids=[Path(p).name for p in _SCALE_DIRS]
)
def test_closure_iteration_bound_is_a_fixpoint(sf_dir):
    """Run the pipe2 pair graph's closure with _CLOSURE_ITERS and with one
    extra round; identical labels proves the unroll bound covers every
    fixture component's diameter (label propagation gains exactly one hop
    per round, so fixpoint-at-k ⇒ exact for all deeper unrolls too).

    Parameterized over EVERY available scale dir (ADVICE r6): the driver
    compares at sf0.01, but make_scale_sf's perturbed copies (.scale/sf1)
    are exactly where a longer dup-chain could appear, and that would make
    the ORACLE wrong with a misleading 'Spark mismatch' signal."""
    import duckdb

    reg = ordered_registry()
    base_sql = reg["pipe2_fuzzy_dedup"].oracle
    extra = pllm._CLOSURE_ITERS + 1
    prev = pllm._CLOSURE_ITERS
    deeper_sql = base_sql.replace(
        f"labels AS (SELECT a AS doc_id, lbl AS component_id FROM l{prev})",
        f"""l{extra} AS MATERIALIZED (
         SELECT e.a, least(min(o.lbl), min(n.lbl)) AS lbl
         FROM edges e
         JOIN l{prev} o ON o.a = e.a
         JOIN l{prev} n ON n.a = e.b
         GROUP BY e.a),
       labels AS (SELECT a AS doc_id, lbl AS component_id FROM l{extra})""",
    )
    assert deeper_sql != base_sql, "closure CTE shape changed; update this test"
    con = duckdb.connect()
    con.sql("SET threads=8")
    for tbl in ("documents",):
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    a = sorted(con.sql(base_sql).fetchall())
    b = sorted(con.sql(deeper_sql).fetchall())
    assert a == b, "one extra propagation round changed labels — diameter exceeded"
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [
        # closure shapes (the r5 killers)
        "d8_semantic_dedup",
        "pipe2_fuzzy_dedup",
        "d6_dup_clusters",
        # unrolled-cosine shapes (the other measured map hog)
        "d5b_embedding_near_dup_ivf",
        "d5_embedding_near_dup",
        "q4_dedup_quality",
        "fx_ann",
        "fx_ann_trained",
        # the heaviest surviving union probes / direct rows (r7 split
        # fx_release_flow and fx_dedup_quality into these direct rows)
        "pipe3_corpus_release",
        "n3_ann_lsh",
        "fx_streaming_batch",
        "fx_streaming_lake",
        "fx_dedup_pairs",
        # round-7 session-2 closure carriers: the leakage-safe split, the
        # soft-dedup weights (both ride d6's closure) and the composed
        # release flow (scrub + classifier + closure in ONE statement)
        "sp20_leakage_safe_split",
        "d11_soft_dedup_weights",
        "pipe5_release_v2",
    ],
)
def test_closure_oracles_fit_map_budget_at_default_threads(name):
    reg = ordered_registry()
    sql = reg[name].oracle if name in DRIVER_WINDOW else None
    if sql is None:  # component rides a probe — check the probe's slice
        from mrf_etl_spark.plans.parity_fused import FUSE_SPECS

        probe = next(
            p for p, comps in FUSE_SPECS.items() if any(c == name for c, _ in comps)
        )
        sql = reg[probe].oracle
    proc = subprocess.run(
        [sys.executable, "-c", _MAP_WORKER, SF_001],
        input=sql,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    rows, peak_extra_maps = map(int, proc.stdout.strip().splitlines()[-1].split())
    assert rows > 0
    assert peak_extra_maps < MAP_BUDGET, (
        f"{name}: oracle grew /proc/self/maps by {peak_extra_maps} "
        f"(budget {MAP_BUDGET}) — would risk the driver's vm.max_map_count"
    )
