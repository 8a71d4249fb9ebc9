#!/usr/bin/env python3
"""Knob-sweep prototype for the graph-ANN rework (round 14).

Replicates GraphAnn.scala's deterministic build+search in numpy so
beam/rounds/K/seed choices can be swept in seconds instead of sbt minutes.
NOT part of the library; tuning artifact only.
"""
import sys, itertools
import numpy as np
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "0.1"
t = pq.read_table(f"/root/testdata/sf{SF}/embeddings.parquet")
vec_id = t.column("vec_id").to_numpy()
emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
norm_sq = (emb * emb).sum(axis=1)
keep = (norm_sq > 0) & np.isfinite(norm_sq)
vec_id, emb, norm_sq = vec_id[keep], emb[keep], norm_sq[keep]
order = np.argsort(vec_id)
vec_id, emb, norm_sq = vec_id[order], emb[order], norm_sq[order]
N, D = emb.shape
nrm = np.sqrt(norm_sq)
unit = emb / nrm[:, None]
print(f"N={N} D={D}")

id2ix = {int(v): i for i, v in enumerate(vec_id)}
qmask = (vec_id % 50 == 0) & (vec_id < 2500)
qix = np.where(qmask)[0]
print(f"queries={len(qix)}")

# exact top-3 (by cosine desc, vec_id asc)
S = unit @ unit.T
exact = {}
for q in qix:
    s = S[q].copy(); s[q] = -2
    ordr = np.lexsort((vec_id, -s))
    exact[q] = set(ordr[:3])

# LSH buckets, tables 0 (mult 13) and 1 (mult 15), 12 planes
def buckets(mult):
    P = 12
    w = ((np.arange(P)[:, None] * 37 + np.arange(D)[None, :] * mult) % 19 - 9).astype(np.float64)
    proj = emb @ w.T  # (N, P)
    bits = (proj >= 0).astype(np.int64)
    return (bits * (1 << np.arange(P))).sum(axis=1)

b0, b1 = buckets(13), buckets(15)
from collections import defaultdict
def co(b):
    d = defaultdict(list)
    for i, bb in enumerate(b): d[bb].append(i)
    return d
co0, co1 = co(b0), co(b1)
occ = [len(v) for v in co0.values()]
print(f"t0 buckets={len(co0)} max_occ={max(occ)} mean_occ={np.mean(occ):.2f}")

def topk_per_src(pairs, K):
    """pairs: set of (src,dst) index pairs -> dict src -> list[(dst,cos)] best K."""
    bysrc = defaultdict(list)
    for s, d in pairs:
        bysrc[s].append(d)
    g = {}
    for s, ds in bysrc.items():
        ds = sorted(set(ds))
        cs = S[s, ds]
        o = np.lexsort((np.array([vec_id[d] for d in ds]), -cs))[:K]
        g[s] = [(ds[i], cs[i]) for i in o]
    return g

def build(K, rounds, rho_cap):
    pairs = set()
    for i in range(N):
        for off in range(-3, 4):
            if off == 0: continue
            j = id2ix.get(int(vec_id[i]) + off)
            if j is not None: pairs.add((i, j))
    for cod in (co0, co1):
        for mem in cod.values():
            for a in mem:
                for b in mem:
                    if a != b: pairs.add((a, b)); pairs.add((b, a))
    g = topk_per_src(pairs, K)
    for _ in range(rounds):
        # reverse edges capped at rho_cap per node (by cosine desc, vec_id)
        rev = defaultdict(list)
        for s, nbrs in g.items():
            for d, c in nbrs:
                rev[d].append((s, c))
        und = defaultdict(list)
        for s, nbrs in g.items():
            und[s].extend(dd for dd, _ in nbrs)
        for d, incs in rev.items():
            incs.sort(key=lambda x: (-x[1], vec_id[x[0]]))
            und[d].extend(s for s, _ in incs[:rho_cap])
        cand = set()
        for s, nbrs in g.items():
            cand.update((s, d) for d, _ in nbrs)
        for s, mids in und.items():
            for m in mids:
                for d in und.get(m, ()):
                    if s != d: cand.add((s, d))
        # wait: paper joins und x und on x.dst = y.src; here for each node s,
        # for each und-neighbor m, for each und-neighbor d of m: (s, d)
        g = topk_per_src(cand, K)
    return g

def search(g, seeds_lsh_cap, n_landmarks, beam, srounds, rev_serve_cap):
    # undirected serve edges: forward K + reverse capped
    rev = defaultdict(list)
    for s, nbrs in g.items():
        for d, c in nbrs:
            rev[d].append((s, c))
    adj = defaultdict(list)
    for s, nbrs in g.items():
        adj[s].extend(d for d, _ in nbrs)
    for d, incs in rev.items():
        incs.sort(key=lambda x: (-x[1], vec_id[x[0]]))
        adj[d].extend(s for s, _ in incs[:rev_serve_cap])
    landmarks = list(range(min(n_landmarks, N)))  # smallest vec_ids (sorted)
    recalls, budgets = [], []
    for q in qix:
        seeds = set(landmarks)
        for cod, b in ((co0, b0), (co1, b1)):
            mates = [m for m in cod[b[q]] if m != q]
            mates.sort(key=lambda m: vec_id[m])
            seeds.update(mates[:seeds_lsh_cap])
        visited = set(seeds)
        frontier = set(seeds)
        scored = {}
        for _ in range(srounds):
            expand = set()
            for f in frontier:
                expand.update(adj.get(f, ()))
            cand = visited | expand
            for c in cand:
                if c not in scored:
                    scored[c] = S[q, c]
            o = sorted(cand, key=lambda c: (-scored[c], vec_id[c]))
            frontier = set(o[:beam])
            visited = cand
        fin = [c for c in visited if c != q]
        fin.sort(key=lambda c: (-scored[c], vec_id[c]))
        top3 = set(fin[:3])
        recalls.append(len(top3 & exact[q]) / 3.0)
        budgets.append(len(visited))
    return np.mean(recalls), np.mean(budgets)

if __name__ == "__main__":
    for (K, br, rho) in [(6, 2, 6), (6, 3, 6), (8, 3, 8), (8, 4, 8)]:
        g = build(K, br, rho)
        for (lcap, lm, beam, sr) in [(4, 0, 8, 3), (4, 16, 8, 3), (4, 16, 8, 5),
                                      (4, 16, 12, 5), (8, 32, 16, 6), (4, 16, 16, 4)]:
            r, bud = search(g, lcap, lm, beam, sr, rho)
            print(f"K={K} brounds={br} rho={rho} | lshcap={lcap} lm={lm} beam={beam} srounds={sr} -> recall={r:.3f} avg_visited={bud:.0f}")
