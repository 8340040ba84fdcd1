"""Expression-level utilities shared by the JVM-expression operators.

``let`` exists because Spark expressions have no native let-binding: a
COMPUTED (non-attribute) expression captured inside a higher-order-function
lambda body is re-evaluated on EVERY lambda invocation — e.g. a regex
tokenization captured in a per-shingle transform ran once per position,
O(n_tokens²) splits per document, measured at 3-10× the cost of whole
queries at sf0.1. Wrapping the expression as the one-element array target
of an outer ``transform`` turns it into a lambda VARIABLE
(NamedLambdaVariable — a cheap slot read) inside the body.

Prefer materializing as a real column (a staged ``select``) when the
operator owns the DataFrame; ``let`` is for Column-in/Column-out helpers
that cannot stage a projection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` ONCE per row and feed it to ``body`` as a cheap
    lambda variable. Works for any result type (array target -> element_at
    unwrap). Nesting is fine: ``let(a, lambda x: let(b, lambda y: ...))``.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)
