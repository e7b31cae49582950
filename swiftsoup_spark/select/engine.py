"""Selector execution: compile (cached) → mask → document-order ids.

The reference's Collector DFS (Collector.swift:26-99) is replaced by a
single vectorized mask over the arena and an ``np.nonzero``-style sweep in
DFS order — document order is exactly the context subtree's DFS order.
"""

from __future__ import annotations

from swiftsoup_spark.select.evaluators import Ctx
from swiftsoup_spark.select.queryparser import parse_query


def _sweep(ctx, mask) -> list[int]:
    if ctx.order_arr is not None:
        return ctx.order_arr[mask[ctx.order_arr]].tolist()
    return [nid for nid in ctx.order if mask[nid]]


def select(arena, root: int, css: str) -> list[int]:
    ev = parse_query(css)
    ctx = Ctx(arena, root)
    return _sweep(ctx, ev.mask(ctx))


def select_eval(arena, root: int, ev) -> list[int]:
    ctx = Ctx(arena, root)
    return _sweep(ctx, ev.mask(ctx))


def node_matches(arena, nid: int, css: str) -> bool:
    """Element.is(css): evaluated against the element's root."""
    ev = parse_query(css)
    root = nid
    while arena.parent[root] != -1:
        root = arena.parent[root]
    ctx = Ctx(arena, root)
    return bool(ev.mask(ctx)[nid])
