"""Generate a larger scale-factor copy of the driver testdata for LOCAL
scale rehearsals (SCALE.md): replicate /root/testdata/sf0.1 `m` times with
consistent key offsets, so every FK relationship and group-cardinality
growth matches a real 10x scale-up.

Naive replication would make every document/embedding an EXACT copy of
its 9 siblings, inflating dedup/ANN candidate-pair counts ~quadratically
(45 intra-group pairs per doc group) — a workload no real corpus has. So:

* documents: copy 0 keeps the original text (preserving the authored
  near-dup structure); copies 1..m-1 tag every second word with a
  copy-specific suffix, which rewrites every k>=2 shingle and makes the
  copy a genuinely new document at shingle granularity while keeping
  length/vocabulary-shape distributions intact.
* embeddings: copies 1..m-1 rotate the vector dimensions by a
  copy-specific shift — random high-dim vectors decorrelate under
  rotation, so cross-copy cosines fall to the background level while
  norms and per-dim stats are preserved.

Usage: python scripts/make_scale_sf.py [src_dir] [dst_dir] [m]
Defaults: /root/testdata/sf0.1 .scale/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: Path, name: str) -> pa.Table:
    return pq.read_table(src / f"{name}.parquet")


def _max(tbl: pa.Table, col: str) -> int:
    return int(pa.compute.max(tbl[col]).as_py())


def _shift(tbl: pa.Table, col: str, off: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    shifted = pa.compute.add(tbl[col], pa.scalar(off, type=tbl.schema.field(i).type))
    return tbl.set_column(i, tbl.schema.field(i), shifted)


def _perturb_text(texts: list[str], copy: int) -> list[str]:
    tag = f"c{copy}"
    out = []
    for t in texts:
        words = t.split(" ")
        out.append(
            " ".join(w + tag if i % 2 else w for i, w in enumerate(words))
        )
    return out


def write_zipf_events(src: Path, dst: Path, m: int = 4, hot_ranks: int = 8) -> int:
    """Zipf-skewed events fixture (round-8, VERDICT r7 #7): the repo's
    skew-safety arguments for t18/d11/sp20 rest on AQE splitting a
    pathological shuffle key, but no driver fixture actually HAS one — the
    synthetic events table is near-uniform. This writes one: events
    replicated ``m``× (event_id offset, FK structure intact), then
    ``user_id`` reassigned by a geometric rank ladder — rank r takes
    ~2^-(r+1) of ALL rows (rank 0 = 50%, rank 1 = 25%, …), ranks beyond
    ``hot_ranks`` keep their original near-uniform user — i.e. a
    zipf-shaped head over a uniform tail, the web-corpus boilerplate /
    hot-user profile. Hot keys are user ids 1..hot_ranks, which exist in
    every sf's customer table, so the fixture joins to the real dim.
    Rank assignment hashes event_id (Knuth multiplicative) so hot rows
    spread across the file, not one contiguous run. ``customer`` is
    copied unchanged for self-contained joins. Returns the row count."""
    ev = _read(src, "events")
    b_event = _max(ev, "event_id") + 1
    big = pa.concat_tables([_shift(ev, "event_id", c * b_event) for c in range(m)])
    eid = np.asarray(big["event_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    frac = ((eid * np.uint64(2654435761)) % np.uint64(2**32)) / float(2**32)
    # geometric ladder: rank r iff frac ∈ [1-2^-r, 1-2^-(r+1))
    rank = np.floor(-np.log2(1.0 - np.clip(frac, 0.0, 1.0 - 2.0**-32))).astype(
        np.int64
    )
    orig = np.asarray(big["user_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    new_user = np.where(rank < hot_ranks, rank + 1, orig)
    i = big.schema.get_field_index("user_id")
    big = big.set_column(i, big.schema.field(i), pa.array(new_user, type=pa.int64()))
    dst.mkdir(parents=True, exist_ok=True)
    pq.write_table(big, dst / "events.parquet")
    pq.write_table(_read(src, "customer"), dst / "customer.parquet")
    print(f"zipf events: {ev.num_rows} -> {big.num_rows} "
          f"(rank-0 share ~{np.mean(new_user == 1):.2f})", flush=True)
    return big.num_rows


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "zipf":
        src = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/root/testdata/sf0.1")
        dst = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(".scale/zipf")
        m = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        write_zipf_events(src, dst, m)
        return
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/testdata/sf0.1")
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(".scale/sf1")
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dst.mkdir(parents=True, exist_ok=True)

    for name in ("nation", "region"):
        pq.write_table(_read(src, name), dst / f"{name}.parquet")

    cust = _read(src, "customer")
    ev = _read(src, "events")
    supp = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    li = _read(src, "lineitem")
    docs = _read(src, "documents")
    emb = _read(src, "embeddings")

    # shared offset bases: user_id references c_custkey (st8's enrich
    # join), so customer and events must shift by the SAME base
    b_cust = max(_max(cust, "c_custkey"), _max(ev, "user_id")) + 1
    b_supp = _max(supp, "s_suppkey") + 1
    b_part = _max(part, "p_partkey") + 1
    b_order = _max(orders, "o_orderkey") + 1
    b_event = _max(ev, "event_id") + 1
    b_doc = _max(docs, "doc_id") + 1
    b_vec = _max(emb, "vec_id") + 1

    plans = {
        "customer": (cust, {"c_custkey": b_cust}),
        "supplier": (supp, {"s_suppkey": b_supp}),
        "part": (part, {"p_partkey": b_part}),
        "orders": (orders, {"o_orderkey": b_order, "o_custkey": b_cust}),
        "lineitem": (
            li,
            {"l_orderkey": b_order, "l_partkey": b_part, "l_suppkey": b_supp},
        ),
        "events": (ev, {"event_id": b_event, "user_id": b_cust}),
    }
    for name, (tbl, bases) in plans.items():
        copies = []
        for c in range(m):
            t = tbl
            for col, base in bases.items():
                t = _shift(t, col, c * base)
            copies.append(t)
        pq.write_table(pa.concat_tables(copies), dst / f"{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {tbl.num_rows * m}", flush=True)

    texts = docs["text"].to_pylist()
    langs, sources = docs["lang"], docs["source"]
    doc_ids = docs["doc_id"]
    copies = []
    for c in range(m):
        new_texts = texts if c == 0 else _perturb_text(texts, c)
        arr_text = pa.array(new_texts, type=pa.string())
        copies.append(
            pa.table(
                {
                    "doc_id": pa.compute.add(doc_ids, c * b_doc),
                    "text": arr_text,
                    "lang": langs,
                    "source": sources,
                    "n_chars": pa.array(
                        [len(t) for t in new_texts], type=pa.int64()
                    ),
                },
                schema=docs.schema,
            )
        )
    pq.write_table(pa.concat_tables(copies), dst / "documents.parquet")
    print(f"documents: {docs.num_rows} -> {docs.num_rows * m}", flush=True)

    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    labels, vec_ids = emb["label"], emb["vec_id"]
    copies = []
    for c in range(m):
        v = vecs if c == 0 else np.roll(vecs, (c * dim) // m, axis=1)
        copies.append(
            pa.table(
                {
                    "vec_id": pa.compute.add(vec_ids, c * b_vec),
                    "embedding": pa.array(
                        list(v), type=pa.list_(pa.float32())
                    ),
                    "label": labels,
                },
                schema=emb.schema,
            )
        )
    pq.write_table(pa.concat_tables(copies), dst / "embeddings.parquet")
    print(f"embeddings: {emb.num_rows} -> {emb.num_rows * m}", flush=True)


if __name__ == "__main__":
    main()
