"""Expression-level LET binding.

Spark's expression interpreter has no common-subexpression elimination
inside higher-order functions: every *reference* to a child expression in a
lambda body is re-evaluated per array element, and nesting multiplies
(``transform(seq(0..63), i -> ... transform(shingles_expr, ...))``
re-evaluates ``shingles_expr`` — including any regex normalization it
contains — 64x per row; the shingle lambda referencing the normalized text
re-evaluates the regex per offset, compounding to ~20k regex calls per row).

``let`` binds a value as a HOF lambda variable — the one per-row binding
mechanism the expression language has — so it is computed exactly once per
row no matter how many times the body references it, without resorting to
exchange barriers between projections.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row and bind it into ``body``.

    Implementation: wrap in a 1-element array, ``transform`` with the body
    (the element is a lambda variable = a cheap slot read), take element 0.
    """
    return F.get(F.transform(F.array(value), body), 0)
