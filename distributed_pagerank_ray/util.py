"""Small shared utilities."""

from __future__ import annotations

import pyarrow as pa


def compact_for_join(ds, num_partitions: int):
    """Compact a Dataset so Dataset.join can consume it.

    Ray Data 2.49.2's hash-join finalize fails with ArrowInvalid
    ("No match ... for key field") when an input dataset contains
    0-row blocks (typed or not). Repartition to at most one block per
    row so every block is non-empty. Costs a rebalance pass — only the
    block *layout* moves; at scale num_partitions << rows so this is a
    plain repartition any join would want anyway.
    """
    m = ds.materialize()
    rows = m.count()  # free: metadata of the materialized dataset
    nb = max(1, min(num_partitions, rows))
    return m.repartition(nb)  # lazy; the consuming join executes it


def semi_join_filter(ds, col: str, keys, keep: bool = True):
    """Semi (keep=True) / anti (keep=False) join against a small key set:
    broadcast the keys once via ray.put, filter inside map_batches —
    no shuffle (guide's semi/anti-join pattern; a Bloom filter swaps in
    for the exact set at larger key counts)."""
    import numpy as np

    import ray

    arr = np.sort(np.asarray(keys if isinstance(keys, np.ndarray) else list(keys)))
    ref = ray.put(arr)

    def fn(t: pa.Table) -> pa.Table:
        if col not in t.column_names:
            return t
        ks = ray.get(ref)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, vals)
        idx[idx >= len(ks)] = len(ks) - 1 if len(ks) else 0
        present = (ks[idx] == vals) if len(ks) else np.zeros(len(vals), dtype=bool)
        return t.filter(pa.array(present if keep else ~present))

    return ds.map_batches(fn, batch_format="pyarrow")


def ensure_schema(schema: dict[str, pa.DataType]):
    """map_batches fn that re-asserts a fixed schema on every block.

    Ray Data's hash-shuffle/aggregate operators can emit 0-row blocks
    with an EMPTY schema (observed on 2.49.2); Acero hash joins then
    fail with "No match ... for key field". Pass the output of any
    groupby that feeds a join through this to pin the schema. Non-empty
    blocks must already contain the named columns.
    """

    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in schema.items():
            if name in t.column_names:
                col = t.column(name)
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                if len(t) != 0:
                    raise KeyError(f"column {name} missing from non-empty block")
                cols[name] = pa.array([], typ)
        return pa.table(cols)

    return fn
