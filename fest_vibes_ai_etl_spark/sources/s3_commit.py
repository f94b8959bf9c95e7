"""S3 conditional-PUT commit backend for the versioned table.

The commit protocol (sources/merge_store.py) needs exactly one primitive
from storage: atomic put-if-absent with truthful ownership. On S3 that is
``PutObject`` with ``If-None-Match: *`` (generally available on S3 since
2024; also supported by GCS XML API and most S3-compatible stores). This
adapter implements the same backend interface as ``LocalFSCommitBackend`` /
``MemoryObjectStoreCommitBackend``, so the whole merge/race/rebase suite
runs unchanged against it — in tests with a stubbed client replaying the
injected fault modes, in deployment with a real ``boto3`` client
(guard-imported like every other production seam in this repo).

Failure semantics implemented (the part a naive adapter gets wrong):

- **412 PreconditionFailed** — the name exists: we lost the race, False.
- **409 ConditionalRequestConflict** — a CONCURRENT conditional writer was
  mid-flight; S3 asks the caller to retry. Loop: the retry either lands
  (True) or sees the winner's object via 412 (False).
- **Ambiguous 5xx/timeout** — the response was lost AFTER the PUT may have
  become durable. Resolved by read-back: manifests embed per-writer staging
  UUIDs, so byte-comparing the stored object decides ownership exactly —
  ours → True, someone else's → False, absent → the PUT never became
  durable, retry it.

LIST on S3 has no read-after-write ordering guarantee relative to other
writers' PUTs; the protocol tolerates a stale LIST because the CAS — never
the listing — arbitrates commits (see the stale_list fault test).
"""

from __future__ import annotations

# 5xx / throttling codes where S3 leaves durability UNKNOWN: the request
# may or may not have been applied, so the adapter must read back, never
# assume. (RequestTimeout is the classic: the body uploaded, the ack died.)
_AMBIGUOUS_CODES = frozenset(
    {"InternalError", "500", "503", "SlowDown", "ServiceUnavailable",
     "RequestTimeout"}
)
_LOST_RACE_CODES = frozenset({"PreconditionFailed", "412"})
_RETRY_RACE_CODES = frozenset({"ConditionalRequestConflict", "409"})
_MISSING_CODES = frozenset({"NoSuchKey", "404"})


def _err_code(exc: Exception) -> str | None:
    """Error code from a botocore-ClientError-shaped exception (duck-typed:
    no botocore import, so stub clients work in environments without it)."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return resp.get("Error", {}).get("Code")
    return None


class S3CommitBackend:
    """Commit backend over an S3 client (``boto3.client("s3")`` or any
    object with the same ``put_object/get_object/list_objects_v2``
    surface). ``bucket`` is the default bucket for plain paths; full
    ``s3://bucket/key`` paths carry their own."""

    # Retry budget for put_if_absent: 409/ambiguous-5xx paths retry with
    # exponential backoff + full jitter (base 50 ms, cap 5 s) and give up
    # after max_attempts — a persistently throttling endpoint must surface
    # as an error, not a hot infinite loop hammering S3.
    def __init__(self, bucket: str | None = None, client=None,
                 max_attempts: int = 8, backoff_base: float = 0.05,
                 backoff_cap: float = 5.0, sleep=None):
        if client is None:
            import boto3  # guard-import: the production dependency

            client = boto3.client("s3")
        self.client = client
        self.bucket = bucket
        self.max_attempts = max_attempts
        self.backoff_base = backoff_base
        self.backoff_cap = backoff_cap
        if sleep is None:
            import time

            sleep = time.sleep
        self._sleep = sleep  # injectable so fault tests don't wall-wait

    def _backoff(self, attempt: int) -> None:
        import random

        self._sleep(
            random.uniform(
                0, min(self.backoff_cap, self.backoff_base * (2 ** attempt))
            )
        )

    def _loc(self, path: str) -> tuple[str, str]:
        if path.startswith("s3://"):
            bucket, _, key = path[5:].partition("/")
            return bucket, key
        if self.bucket is None:
            raise ValueError(
                f"plain path {path!r} needs a default bucket on the backend"
            )
        return self.bucket, path.lstrip("/")

    def list(self, commits_dir: str) -> list[str]:
        """Paginated LIST with per-page transient-5xx retry. A long commit
        history paginates, and S3 throttling (SlowDown/503) mid-walk is
        routine at scale — a raw exception there would fail the whole
        commit resolution for a transient condition. A LIST is a pure
        read, so retrying the SAME page (the ContinuationToken stays
        valid) is always safe; the retry budget is per page, bounded by
        the same backoff policy as put_if_absent so a persistently
        throttling endpoint still surfaces as an error."""
        bucket, key = self._loc(commits_dir)
        prefix = key.rstrip("/") + "/"
        names: list[str] = []
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix, "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            for attempt in range(self.max_attempts):
                if attempt:
                    self._backoff(attempt - 1)
                try:
                    resp = self.client.list_objects_v2(**kw)
                    break
                except Exception as exc:
                    if (
                        _err_code(exc) not in _AMBIGUOUS_CODES
                        or attempt == self.max_attempts - 1
                    ):
                        raise
            names.extend(
                o["Key"][len(prefix):] for o in resp.get("Contents", [])
            )
            if not resp.get("IsTruncated"):
                return names
            token = resp.get("NextContinuationToken")

    def get(self, path: str) -> bytes:
        bucket, key = self._loc(path)
        try:
            return self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
        except Exception as exc:
            if _err_code(exc) in _MISSING_CODES:
                raise FileNotFoundError(path) from exc
            raise

    def put_if_absent(self, path: str, data: bytes) -> bool:
        bucket, key = self._loc(path)
        # Set once an ambiguous error's read-back saw the object ABSENT:
        # the original request may still be in flight server-side, so a
        # later 412 can be our OWN bytes landing — it must be resolved by
        # byte compare, not reported as a lost race.
        ambiguous_inflight = False
        for attempt in range(self.max_attempts):
            if attempt:
                self._backoff(attempt - 1)
            try:
                self.client.put_object(
                    Bucket=bucket, Key=key, Body=data, IfNoneMatch="*"
                )
                return True
            except Exception as exc:
                code = _err_code(exc)
                if code in _LOST_RACE_CODES:
                    if ambiguous_inflight:
                        try:
                            return self.get(path) == data
                        except FileNotFoundError:
                            continue  # 412 then absent: raced a delete; retry
                    return False
                if code in _RETRY_RACE_CODES:
                    continue  # concurrent conditional writer: retry the CAS
                if code in _AMBIGUOUS_CODES:
                    # durability unknown — read back and decide by bytes
                    try:
                        return self.get(path) == data
                    except FileNotFoundError:
                        ambiguous_inflight = True
                        continue  # not durable YET — may still land
                raise
        raise TimeoutError(
            f"put_if_absent({path!r}): no definitive outcome after "
            f"{self.max_attempts} attempts (persistent throttling/conflict "
            f"from the endpoint) — commit state unknown, not retrying "
            f"further"
        )
