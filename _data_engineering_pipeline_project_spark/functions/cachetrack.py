"""Ambient attribution of operator-internal caches to the running query.

The query layer bounds per-call ``.cache()`` frames to ONE live
generation across a long session (``queries_ext.track_query_caches``,
ADVICE r7 #4) — but only for frames the query function itself can name.
Operators that cache multi-consumer intermediates INSIDE their own body
(the SimHash signature frame, a hot-filtered shingle table, the IVF
assignment frame) return a DataFrame that merely references those
frames; the calling query cannot register what it cannot see, so across
many registered-query invocations in one session those internal caches
accumulate exactly like the query-level ones did (MEMORY_AND_DISK
spills to disk rather than evicting — unbounded local-disk growth).

This module is the seam that closes the gap without coupling operators
to the query registry: the ``@query`` decorator opens a collection
context around the OUTERMOST registered-query construction, operators
call :func:`note_query_cache` on each frame they mark, and the
decorator folds whatever was collected into the query's tracked
generation. Outside any registered query (operators used as a library,
unit tests) the note is a no-op and operator semantics are unchanged.

Nesting rule: registered queries may build on other registered queries;
the OUTER invocation owns the generation (inner invocations inherit the
open context and do not finalize), so a composite's internal caches are
released together when the NEXT top-level query registers — never while
the composite that owns them is still being built.
"""

from __future__ import annotations

import contextvars

from pyspark.sql import DataFrame

# When set: the mutable list collecting the current outermost registered
# query's operator-internal cached frames. None outside any query.
_PENDING: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "query_cache_pending", default=None
)


def note_query_cache(df: DataFrame) -> DataFrame:
    """Record ``df`` (already marked with ``.cache()``/``persist``) as
    belonging to the registered query currently under construction, so
    the query tracker can unpersist it when the next query's generation
    registers. No-op outside a registered-query context. Returns ``df``
    so call sites can wrap the cache mark inline."""
    pending = _PENDING.get()
    if pending is not None:
        pending.append(df)
    return df
