"""Higher-order-function hygiene: bind computed arrays to lambda
VARIABLES before windowed transforms.

The hazard (measured, not theoretical): a ``F.transform`` lambda that
closes over a *computed* column expression re-evaluates that expression
on EVERY element — Catalyst neither common-subexpression-eliminates
lazy lambda bodies nor counts their references in CollapseProject (a
staged ``.select(expr.alias(...))`` gets inlined right back), so
``transform(sequence(...), i -> slice(split(text), i, n))`` costs
O(elements × len) instead of O(len). ops/winnow hit the worst case of
this (a lambda closing over another ``transform`` column → ~50 min of
md5 at sf0.1); the n-gram/chunk/block families shared the same shape.

The fix: evaluate the array ONCE by passing it through a one-element
``transform`` whose lambda receives it as a ``NamedLambdaVariable`` —
variables are materialized values, so inner lambdas access them O(1):

    with_array(F.split(text, " "), lambda w: F.transform(..., w ...))

Measured on a 200k-word document: closure form ~quadratic (minutes),
bound form linear (seconds even for this pathological 16 MB row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["with_array"]


def with_array(arr, fn):
    """Evaluate array expression ``arr`` once per row and pass it to
    ``fn`` as a bound lambda variable; returns ``fn(arr)``'s value.
    ``fn`` must return an expression (any type) built from the
    variable."""
    return F.element_at(F.transform(F.array(arr), fn), 1)
