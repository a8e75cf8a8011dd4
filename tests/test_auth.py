"""C2 parity: HS256 token mint/verify with the reference's claim rules
and failure taxonomy (/root/reference/app/core/auth.py:25-70,
/root/reference/app/core/security.py:46-117), plus the batch-engine
scoping surfaces (pushed-filter reads, token-stamped writes)."""

import json

import pytest

from resume_parser_service_spark.pipeline.auth import (
    AuthenticationError, create_access_token, get_current_user,
    scope_to_user, stamp_owner, verify_commit_scope, verify_jwt_token)

SECRET = "unit-test-secret"
T0 = 1_700_000_000.0  # fixed epoch for deterministic claims


def test_token_round_trip_claims():
    tok = create_access_token({"id": 42, "role": "admin"}, SECRET, now=T0)
    payload = verify_jwt_token(tok, SECRET, now=T0 + 10)
    assert payload["id"] == 42
    assert payload["role"] == "admin"
    assert payload["type"] == "access"
    assert payload["iat"] == int(T0)
    assert payload["exp"] == int(T0) + 30 * 60  # reference default 30 min
    assert get_current_user(tok, SECRET, now=T0 + 10) == 42


def test_expired_token_rejected():
    tok = create_access_token({"id": 1}, SECRET, expires_delta_s=60, now=T0)
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(tok, SECRET, now=T0 + 61)
    assert ei.value.reason == "token_expired"


def test_tampered_signature_rejected():
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    head, body, sig = tok.split(".")
    bad = head + "." + body + "." + ("A" if sig[0] != "A" else "B") + sig[1:]
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(bad, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


def test_non_ascii_token_stays_in_taxonomy():
    """A token with a valid header but a non-ASCII payload segment must
    raise AuthenticationError, not a raw UnicodeEncodeError from the
    signing-input encode (advisor finding, r5)."""
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    head, _body, sig = tok.split(".")
    bad = head + ".paylöad." + sig
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(bad, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


def test_tampered_payload_rejected():
    """Flipping a claim without re-signing must fail: the signature
    covers the payload segment."""
    import base64
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    head, body, sig = tok.split(".")
    claims = json.loads(base64.urlsafe_b64decode(body + "=" * (-len(body) % 4)))
    claims["id"] = 999
    forged = base64.urlsafe_b64encode(
        json.dumps(claims).encode()).rstrip(b"=").decode()
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(head + "." + forged + "." + sig, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


def test_alg_none_rejected():
    """alg=none downgrade: unsigned tokens never verify (the reference
    pins algorithms=[settings.algorithm])."""
    import base64

    def seg(obj):
        return base64.urlsafe_b64encode(
            json.dumps(obj).encode()).rstrip(b"=").decode()
    tok = (seg({"alg": "none", "typ": "JWT"}) + "." +
           seg({"id": 1, "exp": int(T0) + 600, "type": "access"}) + ".")
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(tok, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


def test_wrong_secret_rejected():
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(tok, "other-secret", now=T0)
    assert ei.value.reason == "invalid_token"


def test_refresh_token_type_enforced():
    refresh = create_access_token({"id": 7}, SECRET,
                                  token_type="refresh", now=T0)
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(refresh, SECRET, now=T0)  # expects access
    assert ei.value.reason == "invalid_token_type"
    ok = verify_jwt_token(refresh, SECRET, expected_type="refresh", now=T0)
    assert ok["id"] == 7
    anytype = verify_jwt_token(refresh, SECRET, expected_type=None, now=T0)
    assert anytype["type"] == "refresh"


def test_missing_id_claim():
    tok = create_access_token({"sub": "x"}, SECRET, now=T0)
    with pytest.raises(AuthenticationError) as ei:
        get_current_user(tok, SECRET, now=T0)
    assert ei.value.reason == "missing_claim"


def test_non_int_id_claim():
    tok = create_access_token({"id": "not-a-number"}, SECRET, now=T0)
    with pytest.raises(AuthenticationError) as ei:
        get_current_user(tok, SECRET, now=T0)
    assert ei.value.reason == "invalid_user_id"


def test_malformed_tokens_rejected():
    for bad in ("", "a.b", "a.b.c.d", "!!.??.##"):
        with pytest.raises(AuthenticationError):
            verify_jwt_token(bad, SECRET, now=T0)


def test_non_json_segments_stay_in_taxonomy():
    """Valid base64 that is not a JSON object (header or payload) must
    raise AuthenticationError, never a bare JSONDecodeError or
    AttributeError — every pre-signature parse failure is
    attacker-reachable."""
    import base64

    def seg(raw: bytes) -> str:
        return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()
    for tok in (
        seg(b"hello") + "." + seg(b"{}") + ".AAAA",   # header not JSON
        seg(b"[1]") + "." + seg(b"{}") + ".AAAA",     # header not a dict
    ):
        with pytest.raises(AuthenticationError) as ei:
            verify_jwt_token(tok, SECRET, now=T0)
        assert ei.value.reason == "invalid_token"


def _forge_signed(payload_raw: bytes) -> str:
    """A token with an arbitrary payload segment, VALIDLY signed with
    the test secret (non-conforming minter sharing the key)."""
    from resume_parser_service_spark.pipeline.auth import _b64url, _sign
    import json as _json
    head = _b64url(_json.dumps({"alg": "HS256", "typ": "JWT"},
                               separators=(",", ":")).encode())
    body = _b64url(payload_raw)
    signing_input = (head + "." + body).encode("ascii")
    return head + "." + body + "." + _b64url(_sign(signing_input, SECRET))


def test_signed_scalar_payload_rejected_in_taxonomy():
    tok = _forge_signed(b"5")
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(tok, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


def test_signed_non_numeric_exp_rejected_in_taxonomy():
    import json as _json
    tok = _forge_signed(_json.dumps(
        {"id": 1, "exp": "2026-08-18T00:00:00Z", "type": "access"}).encode())
    with pytest.raises(AuthenticationError) as ei:
        verify_jwt_token(tok, SECRET, now=T0)
    assert ei.value.reason == "invalid_token"


@pytest.fixture()
def tenant_table(spark, tmp_path):
    path = str(tmp_path / "tenant_docs")
    spark.createDataFrame(
        [(uid, f"url://{uid}/{i}", f"doc {uid}-{i}")
         for uid in (1, 2, 3) for i in range(4)],
        "user_id int, url string, text string"
    ).write.parquet(path)
    return path


def test_scope_to_user_filters_and_pushes(spark, tenant_table):
    tok = create_access_token({"id": 2}, SECRET, now=T0)
    df = spark.read.parquet(tenant_table)
    mine = scope_to_user(df, tok, SECRET, now=T0)
    rows = mine.collect()
    assert len(rows) == 4 and {r.user_id for r in rows} == {2}
    # the tenancy predicate must reach the scan, not sit in a Filter
    # above it — that is the whole 100 TB story for C2
    plan = mine._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "EqualTo(user_id,2)" in plan


def test_scope_requires_user_col(spark):
    """A missing scope column is a pipeline wiring bug — plain
    ValueError, kept OUT of the JWT reason taxonomy."""
    df = spark.range(3).withColumnRenamed("id", "x")
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    with pytest.raises(ValueError) as ei:
        scope_to_user(df, tok, SECRET, now=T0)
    assert not isinstance(ei.value, AuthenticationError)


def test_stamp_owner_overrides_spoofed_payload(spark):
    """Write-side: ownership comes from the verified token, never the
    incoming rows (reference create path sets user_id from
    get_current_user, not the request body)."""
    tok = create_access_token({"id": 5}, SECRET, now=T0)
    df = spark.createDataFrame(
        [(99, "url://spoof/1")], "user_id int, url string")
    out = stamp_owner(df, tok, SECRET, now=T0)
    assert [r.user_id for r in out.collect()] == [5]


def test_verify_commit_scope(spark):
    tok = create_access_token({"id": 1}, SECRET, now=T0)
    own = spark.createDataFrame(
        [(1, "a"), (1, "b")], "user_id int, url string")
    assert verify_commit_scope(own, tok, SECRET, now=T0) is own
    mixed = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id int, url string")
    with pytest.raises(AuthenticationError) as ei:
        verify_commit_scope(mixed, tok, SECRET, now=T0)
    assert ei.value.reason == "invalid_user_id"
    nulls = spark.createDataFrame(
        [(None, "a")], "user_id int, url string")
    with pytest.raises(AuthenticationError):
        verify_commit_scope(nulls, tok, SECRET, now=T0)
