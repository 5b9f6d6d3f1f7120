"""Compiled-HLO analysis: per-step collective traffic.

The scaling methodology (docs/SCALING.md, VERDICT r2 #6) needs a
hardware-transferable number: how many bytes of collectives one training
step moves. Wall-clock on a virtual CPU mesh cannot say (all "devices"
share the host cores), but the compiled HLO can — the same program XLA
would run on a real slice, with the same all-reduces. On real hardware,
predicted collective seconds = bytes x algo-factor / ICI bandwidth, to be
compared against the measured compute step time for an efficiency bound.
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# e.g. "%all-reduce.1 = f32[1024,128]{1,0} all-reduce(%x), replica_groups..."
#      "... = (f32[8]{0}, f32[4]{0}) all-reduce(...)"
#      "... = ((f32[8]{0}, f32[4]{0}), (f32[8]{0}, f32[4]{0})) all-reduce-start(...)"
# Real-TPU compiles emit ASYNC pairs ("all-reduce-start" / "all-reduce-done");
# match the "-start" half (it carries the shapes) and skip "-done" so each
# collective counts exactly once regardless of sync/async lowering. The
# shapes group allows ONE level of nesting — XLA's AllReduceCombiner merges
# gradient all-reduces into variadic async ops whose start shape is a
# tuple-of-tuples ((operands...), (results...)).
_OP_RE = re.compile(
    r"=\s*(?P<shapes>\((?:[^()]|\([^()]*\))*\)|\S+)\s+(?P<op>"
    + "|".join(_COLLECTIVES)
    + r")(?P<async>-start)?\("
)
_SHAPE_RE = re.compile(r"(?P<dtype>\w+)\[(?P<dims>[\d,]*)\]")


def _array_bytes(text: str) -> list[int]:
    sizes = []
    for m in _SHAPE_RE.finditer(text):
        dt = _DTYPE_BYTES.get(m.group("dtype"))
        if dt is None:
            continue
        dims = m.group("dims")
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * dt)
    return sizes


def _top_level_groups(shape: str) -> list[str]:
    """Split '((a, b), (c, d), e)' into ['(a, b)', '(c, d)', 'e']."""
    inner = shape.strip()
    if inner.startswith("(") and inner.endswith(")"):
        inner = inner[1:-1]
    groups, depth, cur = [], 0, []
    for ch in inner:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            groups.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        groups.append("".join(cur))
    return groups


def _shape_bytes(shape: str, *, op: str = "", is_async: bool = False) -> int:
    """RESULT bytes of one collective's shape group — what each participant
    receives per step, for every lowering XLA emits:

    - sync, single or variadic: the def shape IS the result (sum arrays).
    - async "-start": the shape is a tuple of (operands, results[, context]).
      Variadic starts nest: ((op...), (res...)) — take the SECOND top-level
      group. Flat 2-tuples (in, out): the result is the larger element for
      all-gather, equal for all-reduce, and the SMALLER one for
      reduce-scatter (its result is the scattered shard).
    """
    if not is_async:
        return sum(_array_bytes(shape))
    groups = _top_level_groups(shape)
    nested = [g for g in groups if g.strip().startswith("(")]
    if len(nested) >= 2:  # variadic: ((operands), (results), context...)
        return sum(_array_bytes(nested[1]))
    sizes = _array_bytes(shape)
    if not sizes:
        return 0
    # Flat start tuples may carry trailing scalar-ish context elements
    # (e.g. u32[] sync flags); restrict the operand/result selection to the
    # first two entries so min() can't pick a 4-byte context element as the
    # reduce-scatter shard.
    sizes = sizes[:2]
    return min(sizes) if op == "reduce-scatter" else max(sizes)


def collective_traffic(hlo_text: str) -> dict:
    """Sum output bytes of every collective op in optimized HLO text.

    Returns {"total_bytes": int, "by_op": {op: {"count": n, "bytes": b}}}.
    Bytes are the collective RESULT sizes — what each participant receives;
    multiply by the ring algo factor (2(d-1)/d for all-reduce) for wire
    bytes on a real slice.
    """
    by_op: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        op = m.group("op")
        b = _shape_bytes(
            m.group("shapes"), op=op, is_async=m.group("async") is not None
        )
        rec = by_op.setdefault(op, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    return {
        "total_bytes": sum(r["bytes"] for r in by_op.values()),
        "by_op": by_op,
    }


def compiled_collective_traffic(compiled) -> dict:
    """collective_traffic of a jax ``Compiled`` object (.as_text())."""
    return collective_traffic(compiled.as_text())
