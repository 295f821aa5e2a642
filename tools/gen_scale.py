"""Deterministic scale-up of the sf0.1 fixture for SCALING MEASUREMENT.

The driver's testdata tops out at sf0.1, where the whole bench suite is
task-overhead-dominated: the r14 scaling block measured the 8-core run
FASTER than 32 cores, so "fine at scale" adjudications were extrapolated
(VERDICT r14, Next round #2). This tool tiles sf0.1 K times (default
K=10 -> "sf1") with deterministic key offsets and per-tile payload
transforms, so the bench's heavy ids can be re-measured at a scale where
parallelism ratios mean something.

Design (perf-measurement fixture, NOT an oracle fixture — results at
this SF are never correctness-checked):
- Keys (doc_id, vec_id, *_key, user_id, event_id) offset per tile so
  joins keep their selectivity and group sizes stay sf0.1-like.
- documents.text gets a per-tile token suffix: cross-tile shingle sets
  are DISJOINT, so dedup group sizes / near-dup density match sf0.1
  (naive tiling would make every doc a 10-way exact dup and blow the
  pair space quadratically).
- embeddings rotate dimensions per tile: norms preserved, LSH buckets
  re-scrambled, so bucket-size distribution scales like a real corpus.
- events shift ts by 400 days per tile AND offset user_id: per-user-day
  span structure is identical per tile, so interval-overlap work scales
  linearly in tiles (not quadratically in concurrent users).
- region/nation are fixed dimensions — copied as-is.
- Each tile is written as its own part file inside <name>.parquet/ so
  scans split across tiles without relying on intra-file row groups.

Usage: python tools/gen_scale.py [--k 10] [--out /root/scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, key columns to offset). Offsets use stride = 10^ceil(log10(max+1))
# so tiled key ranges never collide and stay human-readable.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]


def _stride(tbl: pa.Table, col: str) -> int:
    mx = pc.max(tbl[col]).as_py() or 0
    s = 1
    while s <= mx:
        s *= 10
    return s


def _tile(name: str, tbl: pa.Table, i: int, strides: dict[str, int]) -> pa.Table:
    out = tbl
    for col in KEYED.get(name, []):
        idx = out.schema.get_field_index(col)
        shifted = pc.add(out[col], i * strides[col]).cast(out.schema.field(col).type)
        out = out.set_column(idx, out.schema.field(col), shifted)
    if name == "documents" and i > 0:
        # Per-tile token suffix -> disjoint shingle/token space per tile.
        texts = [
            " ".join(f"{t}~{i}" for t in (s or "").split())
            for s in out["text"].to_pylist()
        ]
        ti = out.schema.get_field_index("text")
        out = out.set_column(ti, out.schema.field("text"), pa.array(texts, pa.string()))
        ni = out.schema.get_field_index("n_chars")
        out = out.set_column(
            ni, out.schema.field("n_chars"),
            pa.array([len(t) for t in texts], pa.int64()),
        )
    if name == "embeddings" and i > 0:
        # Rotate dimensions by i: norm-preserving, re-scrambles LSH buckets.
        embs = [
            None if e is None else e[i % len(e):] + e[: i % len(e)]
            for e in out["embedding"].to_pylist()
        ]
        ei = out.schema.get_field_index("embedding")
        out = out.set_column(
            ei, out.schema.field("embedding"),
            pa.array(embs, out.schema.field("embedding").type),
        )
    if name == "events" and i > 0:
        # +400 days per tile: new days, per-user-day spans identical.
        ts = pc.add(out["ts"].cast(pa.int64()), i * 400 * 86_400 * 1_000_000)
        tsi = out.schema.get_field_index("ts")
        out = out.set_column(
            tsi, out.schema.field("ts"), ts.cast(out.schema.field("ts").type)
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/root/scaledata/sf1")
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for name in COPY_AS_IS:
        src = os.path.join(args.src, f"{name}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: copied")
    for name in KEYED:
        src = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        strides = {c: _stride(src, c) for c in KEYED[name]}
        d = os.path.join(args.out, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        for i in range(args.k):
            pq.write_table(
                _tile(name, src, i, strides),
                os.path.join(d, f"part-{i:03d}.parquet"),
            )
        print(f"{name}: {args.k} tiles x {src.num_rows} rows")


if __name__ == "__main__":
    main()
