"""Commit-backend contract: the put-if-absent CAS under object-store
failure semantics, for BOTH object-store backends — the in-memory model
and the boto3-shaped S3 adapter driven by a stubbed client replaying the
same fault modes. The protocol property under test everywhere: the call
returns True iff OUR bytes own the name afterwards, regardless of what
the network told us in between."""

from __future__ import annotations

import json

import pytest

from fest_vibes_ai_etl_spark.sources.merge_store import (
    MemoryObjectStoreCommitBackend,
    VersionedParquetTable,
)
from fest_vibes_ai_etl_spark.sources.s3_commit import S3CommitBackend


class FakeClientError(Exception):
    """botocore.ClientError shape (duck-typed — no botocore dependency)."""

    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class FakeBotoS3:
    """Stub of the boto3 S3 client surface the adapter uses, with the same
    injectable fault modes as MemoryObjectStoreCommitBackend:

    - error_before_write: 5xx raised BEFORE the object becomes durable
    - error_after_write: object becomes durable, THEN the client sees 5xx
    - precondition_conflict: one 409 ConditionalRequestConflict (concurrent
      conditional writer), object NOT written
    """

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.faults: list[str] = []
        self.list_faults: list[str] = []
        self.put_calls = 0
        self.list_calls = 0
        self._inflight: tuple[str, str, bytes] | None = None

    def inject(self, *modes: str) -> None:
        self.faults.extend(modes)

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        assert IfNoneMatch == "*", "adapter must always send the condition"
        self.put_calls += 1
        if self._inflight is not None:
            # the earlier timed-out request lands server-side just before
            # this call is processed (worst-case interleaving)
            b, k, body = self._inflight
            self._inflight = None
            self.objects.setdefault((b, k), body)
        fault = self.faults.pop(0) if self.faults else None
        if fault == "error_before_write":
            raise FakeClientError("RequestTimeout")
        if fault == "error_inflight_lands_later":
            # timeout on the wire, but the request stays in flight and
            # will land before the NEXT call reaches the server
            self._inflight = (Bucket, Key, bytes(Body))
            raise FakeClientError("RequestTimeout")
        if fault == "precondition_conflict":
            raise FakeClientError("ConditionalRequestConflict")
        if (Bucket, Key) in self.objects:
            raise FakeClientError("PreconditionFailed")
        self.objects[(Bucket, Key)] = bytes(Body)
        if fault == "error_after_write":
            raise FakeClientError("InternalError")
        return {}

    def get_object(self, Bucket, Key):
        try:
            data = self.objects[(Bucket, Key)]
        except KeyError:
            raise FakeClientError("NoSuchKey") from None

        class _Body:
            def read(self_inner):
                return data

        return {"Body": _Body()}

    page_size: int | None = None  # set to paginate listings (IsTruncated)

    def inject_list(self, *codes: str) -> None:
        """Queue per-call LIST faults; "ok" lets a call through so a 5xx
        can be planted MID-pagination (after page 1, before page 2)."""
        self.list_faults.extend(codes)

    def list_objects_v2(self, Bucket, Prefix, Delimiter="/", **kw):
        self.list_calls += 1
        if self.list_faults:
            code = self.list_faults.pop(0)
            if code != "ok":
                raise FakeClientError(code)
        names = sorted(
            k for (b, k) in self.objects
            if b == Bucket and k.startswith(Prefix)
            and "/" not in k[len(Prefix):]
        )
        start = int(kw.get("ContinuationToken") or 0)
        if self.page_size is None:
            page, truncated = names[start:], False
        else:
            page = names[start:start + self.page_size]
            truncated = start + self.page_size < len(names)
        resp = {
            "Contents": [{"Key": k} for k in page],
            "IsTruncated": truncated,
        }
        if truncated:
            resp["NextContinuationToken"] = str(start + self.page_size)
        return resp


def _backends():
    mem = MemoryObjectStoreCommitBackend()
    s3 = S3CommitBackend(bucket="test-bucket", client=FakeBotoS3())
    return [("memory", mem, mem), ("s3", s3, s3.client)]


@pytest.mark.parametrize("kind,backend,faulty", _backends())
def test_put_if_absent_basic_cas(kind, backend, faulty):
    assert backend.put_if_absent("/tbl/_commits/v000000000001.json", b"A") is True
    # second writer loses, truthfully
    assert backend.put_if_absent("/tbl/_commits/v000000000001.json", b"B") is False
    assert backend.get("/tbl/_commits/v000000000001.json") == b"A"
    assert backend.list("/tbl/_commits") == ["v000000000001.json"]


@pytest.mark.parametrize("kind,backend,faulty", _backends())
def test_transient_error_before_durability_retries(kind, backend, faulty):
    faulty.inject("error_before_write")
    assert backend.put_if_absent("/t/_commits/v1.json", b"A") is True
    assert backend.get("/t/_commits/v1.json") == b"A"


@pytest.mark.parametrize("kind,backend,faulty", _backends())
def test_ambiguous_error_after_own_durable_write_is_success(kind, backend, faulty):
    """The PUT landed but the ack was lost: read-back sees OUR bytes."""
    faulty.inject("error_after_write")
    assert backend.put_if_absent("/t/_commits/v1.json", b"MINE") is True
    assert backend.get("/t/_commits/v1.json") == b"MINE"


@pytest.mark.parametrize("kind,backend,faulty", _backends())
def test_ambiguous_error_over_existing_object_is_loss(kind, backend, faulty):
    """Another writer owns the name; our errored conditional PUT must
    report a lost race, not success."""
    assert backend.put_if_absent("/t/_commits/v1.json", b"WINNER") is True
    faulty.inject("error_after_write" if kind == "memory" else "error_before_write")
    assert backend.put_if_absent("/t/_commits/v1.json", b"LOSER") is False
    assert backend.get("/t/_commits/v1.json") == b"WINNER"


def test_s3_conditional_request_conflict_retries_to_truth():
    """409 ConditionalRequestConflict = concurrent conditional writer in
    flight; the adapter retries and the outcome is decided by who owns the
    name — both orders."""
    client = FakeBotoS3()
    b = S3CommitBackend(bucket="bkt", client=client)
    client.inject("precondition_conflict")
    assert b.put_if_absent("/t/_commits/v1.json", b"A") is True  # retry wins
    client.inject("precondition_conflict")
    assert b.put_if_absent("/t/_commits/v1.json", b"B") is False  # retry 412s
    assert client.put_calls == 4  # two attempts per call


def test_s3_full_uri_paths_and_missing_get():
    client = FakeBotoS3()
    b = S3CommitBackend(client=client)  # no default bucket: s3:// only
    assert b.put_if_absent("s3://bkt/tbl/_commits/v1.json", b"X") is True
    assert b.get("s3://bkt/tbl/_commits/v1.json") == b"X"
    assert b.list("s3://bkt/tbl/_commits") == ["v1.json"]
    with pytest.raises(FileNotFoundError):
        b.get("s3://bkt/tbl/_commits/v9.json")
    with pytest.raises(ValueError):
        b.put_if_absent("/plain/path.json", b"X")


def test_stale_list_never_corrupts_the_version_chain():
    """LIST omits the newest commit (object-store LIST has no ordering
    guarantee vs other writers' PUTs): a writer that trusts the stale
    listing recomputes version N+1 for an N that is already taken — the
    CAS, not the listing, must arbitrate, and the retry lands on the true
    head with no version overwritten or skipped."""
    be = MemoryObjectStoreCommitBackend()

    def commit(v: int, payload: dict) -> bool:
        return be.put_if_absent(
            f"/t/_commits/v{v:012d}.json", json.dumps(payload).encode()
        )

    assert commit(1, {"a": 1})
    assert commit(2, {"a": 2})
    be.inject("stale_list")
    stale = be.list("/t/_commits")
    assert stale == ["v000000000001.json"]  # v2 hidden
    # writer acts on the stale head: tries to commit v2 — must LOSE
    assert commit(2, {"a": 99}) is False
    # fresh list shows the truth; retry commits v3 on top of the real head
    assert be.list("/t/_commits") == [
        "v000000000001.json", "v000000000002.json"
    ]
    assert commit(3, {"a": 3})
    assert json.loads(be.get("/t/_commits/v000000000002.json")) == {"a": 2}


def test_stale_list_race_through_versioned_table(spark, tmp_path):
    """End-to-end through VersionedParquetTable.merge: a stale LIST before
    writer B's merge makes B compute against the pre-A snapshot; B's first
    CAS loses and the retry path must converge to BOTH writers' rows."""
    be = MemoryObjectStoreCommitBackend()
    t = VersionedParquetTable(str(tmp_path / "vt"), "p", commit_backend=be)

    def src(rows):
        return spark.createDataFrame(rows, "k long, p string, v string")

    t.merge(spark, src([(1, "a", "base")]), keys=["k"])
    t.merge(spark, src([(2, "a", "from_A")]), keys=["k"])  # head is now v2
    be.inject("stale_list")  # B's first latest() misses A's commit
    t.merge(spark, src([(3, "a", "from_B")]), keys=["k"])
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {(1, "base"), (2, "from_A"), (3, "from_B")}
    assert t.latest()[0] == 3


def test_s3_backend_drives_versioned_table_end_to_end(spark, tmp_path):
    """The boto3-shaped adapter passes the same table workflow the other
    backends do: two merges (second with an ambiguous-ack commit), time
    travel, and a read-back of the commit objects from the fake bucket."""
    client = FakeBotoS3()
    t = VersionedParquetTable(
        str(tmp_path / "vt"), "p",
        commit_backend=S3CommitBackend(bucket="bkt", client=client),
    )

    def src(rows):
        return spark.createDataFrame(rows, "k long, p string, v string")

    assert t.merge(spark, src([(1, "a", "x"), (2, "b", "y")]), keys=["k"]) == 1
    client.inject("error_after_write")  # commit ack lost, object durable
    assert t.merge(
        spark, src([(1, "a", "x2")]), keys=["k"], overwrite_cols=["v"]
    ) == 2
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {
        (1, "x2"), (2, "y")
    }
    assert {(r.k, r.v) for r in t.read_version(spark, 1).collect()} == {
        (1, "x"), (2, "y")
    }
    # the version chain physically lives in the (fake) bucket
    keys = sorted(k for (_b, k) in client.objects)
    assert [k.rsplit("/", 1)[-1] for k in keys] == [
        "v000000000001.json", "v000000000002.json"
    ]


def test_put_if_absent_gives_up_after_bounded_retries_with_backoff():
    """A persistently-throttling endpoint (endless 409s) must surface as an
    error after max_attempts, with exponential backoff between attempts —
    never a hot infinite loop hammering S3."""
    sleeps: list[float] = []
    client = FakeBotoS3()
    s3 = S3CommitBackend(
        bucket="b", client=client, max_attempts=4, sleep=sleeps.append
    )
    client.inject(*["precondition_conflict"] * 10)
    with pytest.raises(TimeoutError, match="4 attempts"):
        s3.put_if_absent("/t/_commits/v1.json", b"X")
    assert client.put_calls == 4
    assert len(sleeps) == 3  # no sleep before the first attempt
    # jittered exponential: each delay bounded by base·2^i, capped
    for i, s in enumerate(sleeps):
        assert 0 <= s <= min(s3.backoff_cap, s3.backoff_base * (2 ** i))


def test_s3_truncated_list_pagination_resolves_true_head(spark, tmp_path):
    """LIST pagination fault (VERDICT r6 #6): with the newest commit on a
    later page, the adapter must walk ContinuationToken pages to the end —
    a single-page reader would resolve a stale head and fork the chain."""
    client = FakeBotoS3()
    s3 = S3CommitBackend(bucket="bkt", client=client)
    t = VersionedParquetTable(
        str(tmp_path / "vt"), "p", commit_backend=s3
    )

    def src(rows):
        return spark.createDataFrame(rows, "k long, p string, v string")

    for i in range(3):
        t.merge(spark, src([(i, "a", f"v{i}")]), keys=["k"])
    client.page_size = 1  # 3 commits => 3 pages; newest on the LAST page
    assert s3.list(str(tmp_path / "vt") + "/_commits") == [
        "v000000000001.json", "v000000000002.json", "v000000000003.json"
    ]
    assert t.latest()[0] == 3
    # a merge through the paged listing lands on v4, no overwrite/skip
    t.merge(spark, src([(9, "a", "v9")]), keys=["k"])
    assert t.latest()[0] == 4
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {
        (0, "v0"), (1, "v1"), (2, "v2"), (9, "v9")
    }


def test_paginated_list_with_mid_walk_5xx_resolves_true_head(spark, tmp_path):
    """Pagination MIXED with a transient 5xx mid-walk (VERDICT r7 #7):
    page 1 succeeds, the page-2 request throttles (SlowDown), the retry of
    the SAME page succeeds — the walk must resume at the same
    ContinuationToken and still resolve the TRUE head (newest commit on
    the last page). A reader that aborted or restarted the walk on the
    5xx would resolve a stale head and fork the chain."""
    sleeps: list[float] = []
    client = FakeBotoS3()
    s3 = S3CommitBackend(
        bucket="bkt", client=client, max_attempts=4, sleep=sleeps.append
    )
    t = VersionedParquetTable(str(tmp_path / "vt"), "p", commit_backend=s3)

    def src(rows):
        return spark.createDataFrame(rows, "k long, p string, v string")

    for i in range(3):
        t.merge(spark, src([(i, "a", f"v{i}")]), keys=["k"])
    client.page_size = 1  # 3 commits => 3 pages
    client.inject_list("ok", "SlowDown", "ok", "ok")  # 5xx on page 2 only
    client.list_calls = 0
    assert s3.list(str(tmp_path / "vt") + "/_commits") == [
        "v000000000001.json", "v000000000002.json", "v000000000003.json"
    ]
    assert client.list_calls == 4  # 3 pages + 1 retried page
    assert len(sleeps) == 1  # one backoff, for the one throttled page
    # two consecutive throttles on one page: still resolves (budget is
    # per page, not per walk)
    client.inject_list("SlowDown", "ServiceUnavailable")
    assert t.latest()[0] == 3
    # a persistently-throttling endpoint surfaces as an error, not a loop
    client.inject_list(*["SlowDown"] * 10)
    with pytest.raises(FakeClientError):
        s3.list(str(tmp_path / "vt") + "/_commits")
    # a NON-transient error propagates immediately, no retry
    client.list_faults.clear()
    client.inject_list("AccessDenied")
    client.list_calls = 0
    with pytest.raises(FakeClientError):
        s3.list(str(tmp_path / "vt") + "/_commits")
    assert client.list_calls == 1


def test_ambiguous_inflight_put_landing_after_readback_is_own_success():
    """Timeout with the request still in flight: the read-back sees the
    object ABSENT, the retry PUT then hits 412 because the ORIGINAL
    request landed — the adapter must resolve that 412 by byte compare
    (our bytes own the name => True), not report a lost race."""
    s3 = S3CommitBackend(bucket="b", client=FakeBotoS3())
    s3.client.inject("error_inflight_lands_later")
    assert s3.put_if_absent("/t/_commits/v1.json", b"MINE") is True
    assert s3.get("/t/_commits/v1.json") == b"MINE"


def test_ambiguous_inflight_then_real_loser_still_loses():
    """Same interleaving for writer B, but writer A's commit is already
    durable: B's retry 412 resolves to someone ELSE's bytes => False."""
    s3 = S3CommitBackend(bucket="b", client=FakeBotoS3())
    assert s3.put_if_absent("/t/_commits/v1.json", b"A") is True
    s3.client.inject("error_before_write")  # B times out, nothing in flight
    assert s3.put_if_absent("/t/_commits/v1.json", b"B") is False
    assert s3.get("/t/_commits/v1.json") == b"A"
