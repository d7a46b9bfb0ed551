"""Result ordering / limit semantics, ported from the reference.

The reference buffers results and, every ``limit`` rows, stably sorts the
incoming buffer and merges it into the bounded ordered buffer, truncating to
``limit`` (src/query.rs:594-679).  Output is emitted by popping from the end
of the ordered buffer.  This produces observable tie behavior that plain
"sort then truncate" does NOT reproduce (see repl-tests/limit.noise: with
``order .A`` ascending and ties, full output lists ties in seq-descending
order, while ``limit 1`` keeps the earliest-seq tie).  We therefore port the
machinery literally.

Cross-type value ordering follows the reference's JSON type order
(src/json_value.rs:113-123): null < false < true < number < string.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable


def json_type_rank(v: Any) -> int:
    if v is None:
        return 0
    if v is False:
        return 1
    if v is True:
        return 2
    if isinstance(v, (int, float)):
        return 3
    if isinstance(v, str):
        return 4
    if isinstance(v, list):
        return 5
    return 6


def cmp_json(a: Any, b: Any) -> int:
    """Reference total order (src/json_value.rs:67-123): null < false < true
    < number < string < array < object; arrays/objects element-wise then by
    length; strings byte-wise (Python code-point order ≡ UTF-8 byte order)."""
    ra, rb = json_type_rank(a), json_type_rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra in (0, 1, 2):
        return 0
    if ra == 5:  # arrays
        for x, y in zip(a, b):
            c = cmp_json(x, y)
            if c:
                return c
        return (len(a) > len(b)) - (len(a) < len(b))
    if ra == 6:  # objects: ordered (key, value) pairs
        pa_, pb = list(a.items()), list(b.items())
        for (ka, va), (kb, vb) in zip(pa_, pb):
            if ka != kb:
                return -1 if ka < kb else 1
            c = cmp_json(va, vb)
            if c:
                return c
        return (len(pa_) > len(pb)) - (len(pa_) < len(pb))
    if a < b:
        return -1
    if a > b:
        return 1
    return 0


def cmp_results(orders: list[bool], a: tuple, b: tuple) -> int:
    """orders[n] = True for desc.  a/b are key tuples.

    Mirrors src/query.rs:575-592: ascending keys compare b vs a (the buffer
    is kept in reverse output order and popped from the end)."""
    for n, desc in enumerate(orders):
        c = cmp_json(a[n], b[n]) if desc else cmp_json(b[n], a[n])
        if c != 0:
            return c
    return 0


def order_and_limit(
    rows: Iterable[tuple],
    orders: list[bool],
    limit: int | None,
) -> list[tuple]:
    """Apply the reference's ordering+limit to rows arriving in seq order.

    ``rows`` are (key0, key1, ..., payload) tuples where the first
    ``len(orders)`` elements are the order keys.  Returns rows in output
    order."""
    import functools

    keyfn = functools.cmp_to_key(lambda a, b: cmp_results(orders, a, b))

    if limit is None:
        buf = sorted(rows, key=keyfn)  # stable, like Rust sort_by
        buf.reverse()
        return buf

    def chunks():
        buf = []
        for row in rows:
            buf.append(row)
            if len(buf) == limit:
                yield buf
                buf = []
        if buf:
            yield buf

    return order_and_limit_batched(chunks(), orders, limit)


def order_and_limit_batched(
    batches: Iterable[list[tuple]],
    orders: list[bool],
    limit: int,
) -> list[tuple]:
    """The limited buffered machinery with EXPLICIT merge boundaries: one
    merge per batch instead of one per ``limit`` arrivals.

    Used by the vectorized field-ordered fast path (executor.py): rows that
    can never reach the top ``limit`` are dropped up front, and the
    survivors are re-fed grouped by their ORIGINAL arrival batch
    (``arrival_index // limit``) so the merge interleaving — observable in
    tie order, repl-tests/limit.noise — is byte-identical to feeding the
    full stream.  (Dropped rows sort strictly after every survivor, so
    they can't alter any merge prefix; property-tested in
    tests/test_order_limit.py.)"""
    import functools

    keyfn = functools.cmp_to_key(lambda a, b: cmp_results(orders, a, b))

    ordered: list[tuple] = []
    in_buffer: list[tuple] = []

    def merge():
        nonlocal ordered, in_buffer
        in_buffer.sort(key=keyfn)
        if not ordered:
            ordered, in_buffer = in_buffer, []
            return
        new_buffer: list[tuple] = []
        a = ordered.pop() if ordered else None
        b = in_buffer.pop() if in_buffer else None
        while True:
            if a is not None and b is not None:
                c = cmp_results(orders, a, b)
                if c < 0:
                    new_buffer.append(b)
                    b = in_buffer.pop() if in_buffer else None
                elif c > 0:
                    new_buffer.append(a)
                    a = ordered.pop() if ordered else None
                else:
                    new_buffer.append(a)
                    new_buffer.append(b)
                    a = ordered.pop() if ordered else None
                    b = in_buffer.pop() if in_buffer else None
                if len(new_buffer) >= limit:
                    ordered.clear()
                    in_buffer.clear()
                    del new_buffer[limit:]
                    break
            elif a is not None:
                new_buffer.append(a)
                while len(new_buffer) < limit and ordered:
                    new_buffer.append(ordered.pop())
                break
            elif b is not None:
                new_buffer.append(b)
                while len(new_buffer) < limit and in_buffer:
                    new_buffer.append(in_buffer.pop())
                break
            else:
                break
        new_buffer.reverse()
        ordered = new_buffer
        in_buffer = []

    for batch in batches:
        in_buffer.extend(batch)
        merge()
    merge()
    out = []
    while ordered:
        out.append(ordered.pop())
    return out
