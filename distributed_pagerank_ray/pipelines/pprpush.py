"""Push-based approximate Personalized PageRank (Andersen-Chung-Lang
FOCS 2006) — the LOCAL-computation PPR the power-iteration pipelines
(pagerank_weighted.ppr) can't give at 100 TB: work is proportional to
the mass actually moved (O(1/(α·ε)) pushes total), not to |V|·iters,
so a seed query on a trillion-edge graph touches only the seed's
neighborhood.

Engine shape: the synchronous (batch) push variant through the exact
per-shard BSP of pipelines/pagerank.py — per round, EVERY vertex with
r(u) ≥ ε·deg(u) pushes at once: p(u) += α·r(u), each out-neighbor
receives (1−α)·r(u)/deg(u), r(u) → 0. Deterministic given the graph
(unlike queue-order sequential push), terminates because every push
retires ≥ α·ε·deg(u) residual mass. Dangling actives return their
(1−α)·r(u) to the SEED's residual (the standard restart convention),
which keeps the checkable invariant exact:

    Σp + Σr = 1  at every round  (Δ = α·r − r + (1−α)·r = 0).

At termination every vertex satisfies r(u) < ε·deg(u) (deg > 0) or
r(u) = 0 (dangling), giving the ACL guarantee
‖π − p‖₁ ≤ Σr ≤ ε·m — both facts are emitted as engine-computed gate
flags (the identity posture of r_quantile_sketch / e_pq_adc).

Reference parity anchor: the reference computes only global PageRank
(pkg/graph/pagerank.go); local PPR is the new-engine treatment the
survey's capability matrix mandates for seed-centric web analysis.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.shards import n_shards
from .graphbuild import GraphTables

KIND_DENSE = 0
KIND_SPARSE = 1


@ray.remote(num_returns=5)
def _push_shard(s: int, shard_rows: int, p, r, inv, eps: float, alpha: float, seed: int):
    """One shard's simultaneous push: returns (p_new, r_kept, send,
    n_active, dangling_return). ``send`` is the per-source outflow
    (1−α)·r·inv, nonzero only at active sources — the gather multiplies
    nothing further. Active: r·inv ≥ ε (deg ≥ 1) or r > 0 on dangling
    rows (inv == 0)."""
    dangling = inv == 0.0
    active = np.where(dangling, r > 0.0, r * inv >= eps)
    n_active = int(active.sum())
    if n_active == 0:
        return p, r, None, 0, 0.0
    p_new = p.copy()
    p_new[active] += alpha * r[active]
    send = np.where(active, (1.0 - alpha) * r * inv, 0.0)
    dang_ret = float(((1.0 - alpha) * r)[active & dangling].sum())
    r_kept = np.where(active, 0.0, r)
    return p_new, r_kept, send, n_active, dang_ret


@ray.remote
def _push_gather(block: pa.Table, send_refs: list, n: int, shard_rows: int, S: int):
    """Edge-block gather of pushed mass → S per-shard payloads (the
    pagerank _gather_block shape: num_returns=S ref routing, dense or
    sparse (kind, bytes) payloads, None for untouched shards)."""
    src = block.column("src").to_numpy(zero_copy_only=False)
    dst = block.column("dst").to_numpy(zero_copy_only=False)
    out: list = [None] * S
    if len(src) == 0:
        return tuple(out) if S > 1 else None
    lo, hi = int(src.min()), int(src.max())
    s0, s1 = lo // shard_rows, hi // shard_rows
    sends = [ray.get(sr) for sr in send_refs[s0 : s1 + 1]]
    if any(x is None for x in sends):
        sends = [
            np.zeros(min(shard_rows, n - (s0 + i) * shard_rows)) if x is None else x
            for i, x in enumerate(sends)
        ]
    send = np.concatenate(sends) if s1 > s0 else sends[0]
    off = s0 * shard_rows
    vals = send[src - off]
    nzm = vals != 0.0
    if not nzm.any():
        return tuple(out) if S > 1 else None
    dst, vals = dst[nzm], vals[nzm]
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=vals, minlength=len(uniq))
    shard_of = uniq // shard_rows
    for s in np.unique(shard_of):
        a, b = np.searchsorted(shard_of, [s, s + 1])
        local = uniq[a:b] - s * shard_rows
        v = sums[a:b]
        size = min(shard_rows, n - s * shard_rows)
        if len(local) * 2 > size:
            dense = np.zeros(size)
            dense[local] = v
            out[int(s)] = (KIND_DENSE, dense.tobytes())
        else:
            out[int(s)] = (KIND_SPARSE, local.astype(np.int64).tobytes() + v.tobytes())
    return tuple(out) if S > 1 else out[0]


@ray.remote(num_returns=2)
def _push_reduce(r_kept, seed_local: int, dang_total: float, *payloads):
    """Fold incoming pushed mass into the shard's kept residual; the
    seed's shard also receives the dangling-restart mass. Returns
    (r_new, r_sum)."""
    r_new = r_kept.copy()
    for payload in payloads:
        if payload is None:
            continue
        kind, data = payload
        if kind == KIND_DENSE:
            r_new += np.frombuffer(data, dtype=np.float64)
        else:
            k = len(data) // 16
            local = np.frombuffer(data[: k * 8], dtype=np.int64)
            r_new[local] += np.frombuffer(data[k * 8 :], dtype=np.float64)
    if seed_local >= 0:
        r_new[seed_local] += dang_total
    return r_new, float(r_new.sum())


@dataclass
class PPRPushResult:
    n: int
    seed: int
    rounds: int
    sum_p: float
    sum_r: float
    p_refs: list
    r_refs: list
    shard_rows: int
    res_ok: bool = True  # every vertex below its push threshold at exit
    mass_ok: bool = True  # |Σp + Σr − 1| < 1e-9 (the push invariant)

    def estimates(self) -> "ray.data.Dataset":
        """(id, p) rows, one block per shard."""
        shard_rows, n = self.shard_rows, self.n

        @ray.remote
        def to_table(s: int, p):
            lo = s * shard_rows
            return pa.table(
                {
                    "id": pa.array(np.arange(lo, lo + len(p), dtype=np.int64)),
                    "p": pa.array(p),
                }
            )

        return ray.data.from_arrow_refs(
            [to_table.remote(s, self.p_refs[s]) for s in range(len(self.p_refs))]
        )


def ppr_push(
    graph: GraphTables,
    seed: int,
    alpha: float = 0.15,
    eps: float = 1e-7,
    max_rounds: int = 1000,
) -> PPRPushResult:
    """Approximate PPR from one seed by synchronous residual pushing.
    Raises on max_rounds (fail loudly — geometric drain means a hit
    cap signals a wiring bug, not slow convergence)."""
    n, shard_rows = graph.n, graph.shard_rows
    if not (0 <= seed < n):
        raise ValueError(f"seed must be in [0, {n})")
    S = n_shards(n, shard_rows)
    inv_refs = graph.weight_shards().refs

    @ray.remote(num_returns=2)
    def _init(s: int):
        size = min(shard_rows, n - s * shard_rows)
        p = np.zeros(size)
        r = np.zeros(size)
        if s == seed // shard_rows:
            r[seed - s * shard_rows] = 1.0
        return p, r

    inits = [_init.remote(s) for s in range(S)]
    p_refs = [i[0] for i in inits]
    r_refs = [i[1] for i in inits]

    edges_mat = graph.edges().materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    target_blocks = max(S, min(4 * ncpu, max(1, edges_mat.count() // 65536)))
    blocks = edges_mat.repartition(target_blocks).materialize().to_arrow_refs()
    seed_shard = seed // shard_rows

    rounds = 0
    for _ in range(max_rounds):
        outs = [
            _push_shard.remote(
                s, shard_rows, p_refs[s], r_refs[s], inv_refs[s], eps, alpha, seed
            )
            for s in range(S)
        ]
        n_active = sum(ray.get([o[3] for o in outs]))
        if n_active == 0:
            break
        rounds += 1
        p_refs = [o[0] for o in outs]
        kept_refs = [o[1] for o in outs]
        send_refs = [o[2] for o in outs]
        dang_total = float(sum(ray.get([o[4] for o in outs])))
        gathers = [
            _push_gather.options(num_returns=S).remote(b, send_refs, n, shard_rows, S)
            for b in blocks
        ]
        cols = [gathers] if S == 1 else [list(c) for c in zip(*gathers)]
        reduces = [
            _push_reduce.remote(
                kept_refs[s],
                (seed - s * shard_rows) if s == seed_shard else -1,
                dang_total if s == seed_shard else 0.0,
                *cols[s],
            )
            for s in range(S)
        ]
        r_refs = [rd[0] for rd in reduces]
    else:
        raise RuntimeError(f"ppr_push did not drain within {max_rounds} rounds")

    p_sum = float(sum(ray.get(p).sum() for p in p_refs))
    r_sum = float(sum(ray.get(r).sum() for r in r_refs))

    @ray.remote
    def _res_ok(r, inv):
        dang = inv == 0.0
        return bool(np.all(np.where(dang, r == 0.0, r * inv < eps)))

    res_ok = all(ray.get([_res_ok.remote(r_refs[s], inv_refs[s]) for s in range(S)]))
    return PPRPushResult(
        n=n,
        seed=seed,
        rounds=rounds,
        sum_p=p_sum,
        sum_r=r_sum,
        p_refs=p_refs,
        r_refs=r_refs,
        shard_rows=shard_rows,
        res_ok=res_ok,
        mass_ok=abs(p_sum + r_sum - 1.0) < 1e-9,
    )
