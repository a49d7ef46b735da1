"""Auth crypto (reference F15/F16) on the Python standard library.

The reference uses passlib's ``pbkdf2_sha256`` with an explicit
16-byte salt (``fastapi-backend/fastapiservice/crud.py:14-25``) and
PyJWT HS256 with 30-minute expiry (``jwt_utils.py:8-26``). Neither
library is available here; both algorithms are public standards
(RFC 2898 PBKDF2, RFC 7519 JWT) implemented on ``hashlib``/``hmac``.

These are service-layer scalar functions, not dataflow operators; the
row-level variants (bulk verify) wrap them in pandas UDFs.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time

__all__ = [
    "hash_password",
    "verify_password",
    "create_access_token",
    "verify_token",
    "ACCESS_TOKEN_EXPIRE_MINUTES",
    "EMAIL_PATTERN",
    "PASSWORD_PATTERN",
    "email_ok",
    "password_ok",
    "email_ok_col",
    "password_ok_col",
]

PBKDF2_ROUNDS = 29000  # passlib's pbkdf2_sha256 default
ACCESS_TOKEN_EXPIRE_MINUTES = 30  # jwt_utils.py:9
_DEFAULT_SECRET = "change-me"


def hash_password(password: str, salt: bytes | None = None) -> tuple[bytes, str]:
    """PBKDF2-SHA256 with a 16-byte salt (crud.py:15-16 semantics).
    Returns (salt, hash_string) — salt stored as varbinary(16)."""
    salt = salt if salt is not None else os.urandom(16)
    digest = hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"), salt, PBKDF2_ROUNDS)
    encoded = base64.b64encode(digest).decode("ascii")
    return salt, f"pbkdf2-sha256${PBKDF2_ROUNDS}${encoded}"


def verify_password(password: str, salt: bytes, stored_hash: str) -> bool:
    """Recompute with the stored salt and compare (crud.py:20-25)."""
    try:
        _scheme, rounds_s, encoded = stored_hash.split("$")
        rounds = int(rounds_s)
    except ValueError:
        return False
    digest = hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"), bytes(salt), rounds)
    return hmac.compare_digest(base64.b64encode(digest).decode("ascii"), encoded)


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(data: str) -> bytes:
    pad = -len(data) % 4
    return base64.urlsafe_b64decode(data + "=" * pad)


def create_access_token(
    subject: str,
    secret: str = _DEFAULT_SECRET,
    expire_minutes: int = ACCESS_TOKEN_EXPIRE_MINUTES,
    _now: float | None = None,
) -> str:
    """HS256 JWT with sub + exp claims (jwt_utils.py:11-16)."""
    now = time.time() if _now is None else _now
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}, separators=(",", ":")).encode())
    payload = _b64url(
        json.dumps(
            {"sub": subject, "exp": int(now + expire_minutes * 60)},
            separators=(",", ":"),
        ).encode()
    )
    signing_input = f"{header}.{payload}".encode("ascii")
    sig = _b64url(hmac.new(secret.encode(), signing_input, hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def verify_token(token: str, secret: str = _DEFAULT_SECRET, _now: float | None = None) -> str | None:
    """Decode + verify; returns the subject, or None on any failure —
    expired, malformed, bad signature (jwt_utils.py:19-26 returns None
    rather than raising)."""
    try:
        header, payload, sig = token.split(".")
        signing_input = f"{header}.{payload}".encode("ascii")
        expected = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
        if not hmac.compare_digest(_b64url_decode(sig), expected):
            return None
        claims = json.loads(_b64url_decode(payload))
        now = time.time() if _now is None else _now
        if claims.get("exp", 0) < now:
            return None
        return claims.get("sub")
    except Exception:
        return None


# --------------------------------------------------------------------------
# P7 — registration-form validation regexes (Registration.py:32-35)
# --------------------------------------------------------------------------

#: email must be something@something.com (reference is that literal)
EMAIL_PATTERN = r".+@.+\.(com)$"
#: ≥5 non-space chars including ≥1 special char (lookahead — Java regex
#: via Spark rlike supports it; SURVEY P7)
PASSWORD_PATTERN = r"^(?=.*[!@#$%^&*])\S{5,}$"


def email_ok(email: str) -> bool:
    import re

    return re.search(EMAIL_PATTERN, email or "") is not None


def password_ok(password: str) -> bool:
    import re

    return re.search(PASSWORD_PATTERN, password or "") is not None


def email_ok_col(email):
    """Column predicate form (bulk validation of a registrations table)."""
    return email.rlike(EMAIL_PATTERN)


def password_ok_col(password):
    return password.rlike(PASSWORD_PATTERN)
