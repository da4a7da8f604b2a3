"""SQL let-binding for expensive subexpressions.

Catalyst's CollapseProject inlines projected expressions into
downstream higher-order-function lambdas, and any subexpression inside
a lambda body that doesn't depend on the lambda variable is
re-evaluated PER ELEMENT (no loop-invariant hoisting). A regex
normalization feeding a per-character transform therefore runs the
regex once per character — observed as a 30-50× slowdown in the
shingle/minhash pipeline before this fix.

``let_col(value, body)`` forces single evaluation by binding the value
as a lambda variable: ``transform(array(value), v -> body(v))[0]``.
The array wrapper evaluates ``value`` exactly once per row; the body
sees it as a lambda var, which nested lambdas may capture freely.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column


def let_col(value: Column, body: Callable[[Column], Column]) -> Column:
    return F.transform(F.array(value), body)[0]
