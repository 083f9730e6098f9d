#!/usr/bin/env python3
"""Independent large-scale checker for the two queries whose DuckDB
oracles are infeasible at sf0.1 (recursive CTEs: x16's per-key fold
replay, x34's quadratic reachability). Recomputes both results with
iterative algorithms — a linear fold for x16, union-find connected
components for x34 — and diffs against the engine's Verify dump, so
the two hardest operators get the same scale gate as everything else.

Usage:
  python3 tools/check_sf01.py <sfDir> <verifyOutDir> [reportJson]

<verifyOutDir> must contain x16_admission/ and x34_dedup_clusters/
parquet dumps produced by `runMain graft.Verify <sfDir> <outDir>
x16_admission x34_dedup_clusters`. Exit code 0 iff both match.
"""
import glob
import hashlib
import json
import sys
from functools import lru_cache

import pandas as pd
import pyarrow.parquet as pq


def read_dump(vout, name):
    files = sorted(glob.glob(f"{vout}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no engine dump at {vout}/{name}")
    return pq.ParquetDataset(files).read().to_pandas()


def check_x16(sf, vout):
    """Replay the per-key guarded capacity fold iteratively.

    Engine semantics (MergeOps.admitReservations via x16_admission):
    capacities = part.p_size*10 keyed by p_partkey; requests =
    lineitem quantities folded per key in (seq, id, email, cantidad)
    order with seq = l_orderkey*10 + l_linenumber. id/email never
    break ties beyond seq here (equal seq => identical id and the
    email is constant), so (seq, cantidad) is the full order.
    """
    part = pd.read_parquet(f"{sf}/part.parquet",
                           columns=["p_partkey", "p_size"])
    li = pd.read_parquet(
        f"{sf}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_linenumber", "l_quantity"])
    li = li.assign(
        nombre=li.l_partkey.astype(str),
        seq=li.l_orderkey.astype("int64") * 10 +
            li.l_linenumber.astype("int64"),
        q=li.l_quantity.astype("int64"),
    ).sort_values(["nombre", "seq", "q"], kind="mergesort")
    acc = dict(zip(part.p_partkey.astype(str),
                   part.p_size.astype("int64") * 10))
    for nombre, q in zip(li.nombre.values, li.q.values):
        a = acc.get(nombre)
        if a is not None and q <= a:
            acc[nombre] = a - q
    want = pd.DataFrame(
        {"nombre": list(acc.keys()),
         "capacidad": pd.array(list(acc.values()), dtype="int64")}
    ).sort_values("nombre").reset_index(drop=True)
    got = read_dump(vout, "x16_admission") \
        .sort_values("nombre").reset_index(drop=True)
    got["capacidad"] = got["capacidad"].astype("int64")
    return diff("x16_admission", want, got)


@lru_cache(maxsize=None)
def md5bits64(token):
    # big-endian first 8 digest bytes — TextExprUtil.simhash64's token hash
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def simhash64(text):
    counts = [0] * 64
    for t in text.split(" "):
        v = md5bits64(t)
        for j in range(64):
            counts[j] += 1 if (v >> j) & 1 else -1
    return sum(1 << j for j in range(64) if counts[j] > 0)


def check_x34(sf, vout):
    """Union-find connected components over the 64-bit SimHash <=2-bit
    pair graph (the same fingerprints/threshold as x25/x34; both the
    quotient-neighbor and 3-band engine paths are exact for the
    threshold, so the pair set is simply: all pairs at Hamming
    distance <= 2)."""
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    docs = docs[docs.text.notna()]
    fps = {int(d): simhash64(t)
           for d, t in zip(docs.doc_id.values, docs.text.values)}
    by_fp = {}
    for d, f in fps.items():
        by_fp.setdefault(f, []).append(d)
    # Hamming<=2 neighborhood masks: identity, 64 one-bit, 2016 two-bit
    masks = [0] + [1 << i for i in range(64)] + \
        [(1 << i) | (1 << j) for i in range(64) for j in range(i + 1, 64)]
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label union so the root IS the cluster id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for f, members in by_fp.items():
        for i in range(1, len(members)):  # same-fingerprint clique
            union(members[0], members[i])
        for m in masks[1:]:
            other = by_fp.get(f ^ m)
            if other and f < (f ^ m):  # visit each fp pair once
                union(members[0], other[0])
                # roots suffice: same-fp members already unioned
    labels = sorted((find(d), d) for d in parent)
    want = pd.DataFrame(
        {"doc_id": [d for _, d in labels],
         "cluster": [c for c, _ in labels]})
    want["canonical"] = want.doc_id == want.cluster
    want = want.sort_values(["cluster", "doc_id"]).reset_index(drop=True)
    got = read_dump(vout, "x34_dedup_clusters") \
        .sort_values(["cluster", "doc_id"]).reset_index(drop=True)
    for c in ("doc_id", "cluster"):
        got[c] = got[c].astype("int64")
        want[c] = want[c].astype("int64")
    return diff("x34_dedup_clusters", want, got)


def diff(name, want, got):
    if set(want.columns) != set(got.columns):
        return {"query": name, "match": False,
                "err": f"columns: want {list(want.columns)} "
                       f"got {list(got.columns)}"}
    got = got[list(want.columns)]
    if len(want) != len(got):
        return {"query": name, "match": False, "rows_want": len(want),
                "rows_got": len(got), "err": "row count"}
    neq = (want != got).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        return {"query": name, "match": False, "rows": len(want),
                "err": f"first mismatch at row {i}: "
                       f"want {want.iloc[i].to_dict()} "
                       f"got {got.iloc[i].to_dict()}"}
    return {"query": name, "match": True, "rows": len(want)}


def main():
    sf, vout = sys.argv[1], sys.argv[2]
    report = [check_x16(sf, vout), check_x34(sf, vout)]
    out = json.dumps({r["query"]: r for r in report}, indent=2)
    print(out)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            f.write(out + "\n")
    sys.exit(0 if all(r["match"] for r in report) else 1)


if __name__ == "__main__":
    main()
