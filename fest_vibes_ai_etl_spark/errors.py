"""Error-classification helpers shared by the load-or-first-batch seams.

Several streaming operators use "the stored table does not exist yet" as
the legitimate first-batch signal. That is exactly ONE error condition —
``PATH_NOT_FOUND``. Catching any broader class (all AnalysisException,
say) converts real damage into silent data corruption: an existing-but-
unreadable corpus (files deleted out from under the directory raises
``UNABLE_TO_INFER_SCHEMA``, for instance) would be treated as "first
batch" and every history check skipped.
"""

from __future__ import annotations


def _condition(exc: BaseException) -> str | None:
    """Spark's error condition for an exception, or None when the API
    (getCondition, or getErrorClass on older engines) is unavailable."""
    for name in ("getCondition", "getErrorClass"):
        fn = getattr(exc, name, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            cond = None
        if cond:
            return cond
    return None


def is_missing_or_dataless(exc: BaseException) -> bool:
    """True iff the exception means the store is absent OR exists with
    zero data files (``UNABLE_TO_INFER_SCHEMA``). The BROAD class — only
    for callers whose own contract legitimately produces the dataless
    state (a crashed first append; journal-legal all-rows-excluded
    merges) and whose correct answer is "empty", e.g. the tombstone-aware
    index views and delete ops. Stream history checks must keep using
    :func:`is_path_not_found`: for them a dataless corpus IS damage."""
    if is_path_not_found(exc):
        return True
    cond = _condition(exc)
    if cond is not None:
        return cond == "UNABLE_TO_INFER_SCHEMA"
    return "UNABLE_TO_INFER_SCHEMA" in str(exc)


def is_path_not_found(exc: BaseException) -> bool:
    """True iff the exception is Spark's PATH_NOT_FOUND error condition."""
    cond = _condition(exc)
    if cond is not None:
        return cond == "PATH_NOT_FOUND"
    # very old Spark: fall back to the message text
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)
