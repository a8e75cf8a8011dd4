"""C2: token auth + tenant scoping, batch-engine shape.

The reference gates every request through an HS256 JWT bearer token
and scopes all queries to the token's ``id`` claim
(``/root/reference/app/core/auth.py:25-70`` — ``get_current_user``
with its four-reason failure taxonomy, and
``/root/reference/app/core/security.py:46-117`` — ``create_access_token``
/ ``verify_jwt_token`` with ``exp``/``iat``/``type`` claims). In a
batch engine there is no per-request gateway; the analogous contract
is:

* **token mint/verify** — same HS256 JWT wire format and the same
  claim rules (``exp`` required, ``type`` checked, ``id`` -> int),
  implemented on the stdlib (``hmac``/``hashlib``/``base64``), so a
  token minted by the reference service verifies here and vice versa;
* **read scoping** — ``scope_to_user(df, token)`` appends a
  ``user_id == <claim>`` predicate. Because it is a plain column
  comparison, Catalyst pushes it into the parquet scan
  (``PushedFilters``) and prunes ``user_id``-partitioned layouts —
  at 100 TB tenancy costs a pushed filter, not a gateway hop;
* **write scoping** — ``stamp_owner(df, token)`` overwrites
  ``user_id`` with the verified claim before a commit (the service
  pattern: ownership comes from the token, never the payload), and
  ``verify_commit_scope(df, token)`` is the explicit audit variant
  that fails loud if any row claims another tenant (anti-predicate +
  ``isEmpty`` — one pushed-filter scan, no driver materialization).

Failure taxonomy mirrors the reference ``event_type`` reasons:
``token_expired`` / ``invalid_token`` / ``missing_claim`` /
``invalid_user_id`` / ``invalid_token_type``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time

from pyspark.sql import DataFrame, functions as F

__all__ = ["AuthenticationError", "create_access_token",
           "verify_jwt_token", "get_current_user", "scope_to_user",
           "stamp_owner", "verify_commit_scope"]

TOKEN_TYPE_ACCESS = "access"
TOKEN_TYPE_REFRESH = "refresh"
_DEFAULT_EXPIRE_S = 30 * 60  # reference settings.access_token_expire_minutes


class AuthenticationError(ValueError):
    """Auth failure with the reference's ``reason`` taxonomy
    (``app/core/auth.py`` logs ``auth_failure`` + reason)."""

    def __init__(self, detail: str, reason: str):
        super().__init__(detail)
        self.detail = detail
        self.reason = reason


def _b64url(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode("ascii")


def _b64url_decode(seg: str) -> bytes:
    pad = -len(seg) % 4
    try:
        return base64.urlsafe_b64decode(seg + "=" * pad)
    except Exception as exc:
        raise AuthenticationError(
            f"Invalid token: {exc}", reason="invalid_token") from exc


def _sign(signing_input: bytes, secret: str) -> bytes:
    return hmac.new(secret.encode("utf-8"), signing_input,
                    hashlib.sha256).digest()


def create_access_token(data: dict, secret: str, *,
                        expires_delta_s: int | None = None,
                        token_type: str = TOKEN_TYPE_ACCESS,
                        now: float | None = None) -> str:
    """HS256 JWT with ``exp``/``iat``/``type`` stamped over ``data``
    (reference ``create_access_token``, ``security.py:46-81``).
    ``now`` is injectable for deterministic tests."""
    now = time.time() if now is None else now
    payload = dict(data)
    payload.update({
        "exp": int(now + (expires_delta_s if expires_delta_s is not None
                          else _DEFAULT_EXPIRE_S)),
        "iat": int(now),
        "type": token_type,
    })
    header = {"alg": "HS256", "typ": "JWT"}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":"),
                           sort_keys=True).encode()) + "." +
        _b64url(json.dumps(payload, separators=(",", ":"),
                           sort_keys=True).encode())).encode("ascii")
    return (signing_input.decode("ascii") + "." +
            _b64url(_sign(signing_input, secret)))


def verify_jwt_token(token: str, secret: str, *,
                     expected_type: str | None = TOKEN_TYPE_ACCESS,
                     now: float | None = None) -> dict:
    """Signature + ``exp`` + ``type`` verification (reference
    ``verify_jwt_token``, ``security.py:83-117``: ``require_exp`` is
    on, type checked only when expected)."""
    now = time.time() if now is None else now
    if not token.isascii():
        # JWT compact serialization is ASCII by construction; rejecting
        # up front keeps every parse failure inside the
        # AuthenticationError taxonomy (a non-ASCII payload segment
        # would otherwise escape as a raw UnicodeEncodeError from the
        # signing-input encode — advisor finding, r5)
        raise AuthenticationError(
            "Invalid token: non-ascii", reason="invalid_token")
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthenticationError(
            "Invalid token: malformed", reason="invalid_token")
    try:
        header = json.loads(_b64url_decode(parts[0]) or b"{}")
    except (ValueError, UnicodeDecodeError) as exc:
        raise AuthenticationError(
            f"Invalid token: {exc}", reason="invalid_token") from exc
    if not isinstance(header, dict) or header.get("alg") != "HS256":
        # algorithm confusion (e.g. alg=none) is an invalid token here,
        # same as jose restricting algorithms=[settings.algorithm]
        raise AuthenticationError(
            "Invalid token: bad alg", reason="invalid_token")
    signing_input = (parts[0] + "." + parts[1]).encode("ascii")
    if not hmac.compare_digest(_sign(signing_input, secret),
                               _b64url_decode(parts[2])):
        raise AuthenticationError(
            "Invalid token: bad signature", reason="invalid_token")
    try:
        payload = json.loads(_b64url_decode(parts[1]).decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as exc:
        raise AuthenticationError(
            f"Invalid token: {exc}", reason="invalid_token") from exc
    if not isinstance(payload, dict):
        raise AuthenticationError(
            "Invalid token: payload is not an object",
            reason="invalid_token")
    if "exp" not in payload:
        raise AuthenticationError(
            "Token missing required claims", reason="missing_claim")
    try:
        exp = float(payload["exp"])
    except (TypeError, ValueError) as exc:
        # a validly-signed token with a non-numeric exp (non-conforming
        # minter sharing the secret) stays inside the taxonomy
        raise AuthenticationError(
            "Invalid token: non-numeric exp claim",
            reason="invalid_token") from exc
    if now >= exp:
        raise AuthenticationError(
            "Token has expired", reason="token_expired")
    if expected_type is not None and payload.get("type") != expected_type:
        raise AuthenticationError(
            f"Invalid token type: expected '{expected_type}', got "
            f"'{payload.get('type')}'", reason="invalid_token_type")
    return payload


def get_current_user(token: str, secret: str, *,
                     now: float | None = None) -> int:
    """Token -> ``user_id`` int (reference ``get_current_user``,
    ``auth.py:25-70``): missing ``id`` and non-int ``id`` are distinct
    failures, as in the reference's log taxonomy."""
    payload = verify_jwt_token(token, secret, now=now)
    user_id = payload.get("id")
    if user_id is None:
        raise AuthenticationError(
            "Token missing required claims", reason="missing_claim")
    try:
        return int(user_id)
    except (TypeError, ValueError) as exc:
        raise AuthenticationError(
            "Invalid token payload", reason="invalid_user_id") from exc


def _require_col(df: DataFrame, user_col: str) -> None:
    # a missing scope column is a pipeline WIRING bug, not a token
    # failure — keep it out of the JWT reason taxonomy so consumers
    # keying alerts on token reasons don't misclassify a code bug
    if user_col not in df.columns:
        raise ValueError(
            f"cannot scope: dataframe has no '{user_col}' column")


def scope_to_user(df: DataFrame, token: str, secret: str, *,
                  user_col: str = "user_id",
                  now: float | None = None) -> DataFrame:
    """Tenant-scoped read: every reference repository query filters by
    the token's user (e.g. ``resume_repository`` lookups keyed on
    ``user_id``). A literal equality predicate, so it reaches the
    parquet scan as a pushed filter / partition prune — scoping is
    free at scale."""
    _require_col(df, user_col)
    uid = get_current_user(token, secret, now=now)
    return df.filter(F.col(user_col) == F.lit(uid))


def stamp_owner(df: DataFrame, token: str, secret: str, *,
                user_col: str = "user_id",
                now: float | None = None) -> DataFrame:
    """Ownership for writes comes from the VERIFIED token, never the
    payload (the reference's create path sets ``user_id`` from
    ``get_current_user``, not the request body): overwrite/attach
    ``user_col`` with the claim. Structurally in-scope, zero extra
    scan."""
    uid = get_current_user(token, secret, now=now)
    return df.withColumn(user_col, F.lit(uid))


def verify_commit_scope(df: DataFrame, token: str, secret: str, *,
                        user_col: str = "user_id",
                        now: float | None = None) -> DataFrame:
    """Audit variant of :func:`stamp_owner` for pipelines that carry a
    meaningful ``user_col``: fail loud if any row claims another
    tenant. One pushed anti-predicate + ``isEmpty`` — no driver
    collect of row data."""
    _require_col(df, user_col)
    uid = get_current_user(token, secret, now=now)
    foreign = df.filter((F.col(user_col) != F.lit(uid))
                        | F.col(user_col).isNull())
    if not foreign.isEmpty():
        raise AuthenticationError(
            f"commit contains rows outside user {uid}'s scope",
            reason="invalid_user_id")
    return df
