"""Gateway tests: validator admission contract, executor envelope,
row caps, timeout, schema introspection.

Mirrors + extends the reference's own validator tests
(``/root/reference/etl-service/tests/test_sync.py:28-42``).
"""

from __future__ import annotations

import pytest

from ser_etl_spark.gateway import (
    QueryRejected,
    QueryTimeoutError,
    QueryValidator,
    SnapshotCatalog,
    SparkQueryEngine,
    sanitize_query,
)


@pytest.fixture(scope="module")
def engine(spark, sf_small):
    catalog = SnapshotCatalog(spark, sf_small)
    return SparkQueryEngine(spark, catalog)


# -- validator (C1-C4) ------------------------------------------------------


class TestValidator:
    v = QueryValidator()

    @pytest.mark.parametrize(
        "q,pattern",
        [
            ("SELECT * FROM inventory", "select_all"),
            ("SELECT COUNT(*) FROM products", "count"),
            ("SELECT id, price FROM products", "select_columns"),
            ("SELECT SUM(quantity) FROM inventory", "aggregate"),
            # parens break select_columns' [\w\s,]+ -> falls to group_by
            ("SELECT a, SUM(b) FROM t GROUP BY a", "group_by"),
            ("select * from lowercase_ok", "select_all"),
        ],
    )
    def test_accepts(self, q, pattern):
        assert self.v.validate(q).pattern == pattern

    @pytest.mark.parametrize(
        "q",
        [
            "INSERT INTO t VALUES (1)",
            "DROP TABLE inventory",
            "DELETE FROM t",
            "UPDATE t SET a=1",
            "SELECT * FROM a UNION SELECT * FROM b",
            "CREATE TABLE x AS SELECT 1",
            "EXEC something",
            "PRAGMA version",  # matches no allow pattern
        ],
    )
    def test_rejects(self, q):
        with pytest.raises(QueryRejected):
            self.v.validate(q)

    def test_length_cap(self):
        with pytest.raises(QueryRejected, match="maximum length"):
            self.v.validate("SELECT * FROM t WHERE x = '" + "a" * 5000 + "'")

    def test_row_caps_per_pattern(self):
        assert self.v.validate("SELECT COUNT(*) FROM t").max_rows == 1
        assert self.v.validate("SELECT * FROM t").max_rows == 10000
        # Pattern order is part of the contract: a simple column list
        # matches select_columns (cap 10000) before where_clause sees it —
        # same precedence as the reference's whitelist ordering.
        assert self.v.validate("SELECT a FROM t WHERE a > 1").max_rows == 10000
        assert self.v.validate("SELECT a + 1 FROM t WHERE a > 1").max_rows == 5000

    def test_sanitizer_strips_comments(self):
        q = "SELECT * /* hidden */ FROM t -- trailing\n WHERE a = 1"
        assert sanitize_query(q) == "SELECT * FROM t WHERE a = 1"


# -- executor (C5-C9, B9-B10) ----------------------------------------------


class TestExecutor:
    def test_envelope(self, engine):
        res = engine.execute_query("SELECT COUNT(*) FROM lineitem")
        assert res.row_count == 1
        assert res.columns == ["count(1)"] or len(res.columns) == 1
        assert res.data[0][res.columns[0]] == 6000
        assert res.execution_time_ms > 0
        assert res.pattern == "count"

    def test_max_rows_cap_enforced(self, engine):
        # lineitem has 6000 rows; where_clause pattern caps at 5000 (the
        # `+ 0` expression keeps select_columns' looser 10000 cap from
        # matching first).
        res = engine.execute_query(
            "SELECT l_orderkey + 0 AS k FROM lineitem WHERE l_quantity > 0"
        )
        assert res.row_count == 5000
        assert res.pattern == "where_clause"

    def test_rejected_query_raises(self, engine):
        with pytest.raises(QueryRejected):
            engine.execute_query("DROP TABLE lineitem")

    def test_order_by_limit(self, engine):
        res = engine.execute_query(
            "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 5"
        )
        assert res.row_count == 5
        prices = [r["o_totalprice"] for r in res.data]
        assert prices == sorted(prices, reverse=True)

    def test_schema_introspection(self, engine):
        schema = engine.get_schema()
        assert "lineitem" in schema
        assert "l_orderkey" in schema["lineitem"]
        assert "customer" in schema

    def test_timeout_cancels(self, spark, sf_small):
        catalog = SnapshotCatalog(spark, sf_small)
        validator = QueryValidator(max_execution_time_s=1.0)
        slow_engine = SparkQueryEngine(spark, catalog, validator)
        # Triple cartesian self-join of lineitem (6000^3 = 2.2e11 rows)
        # aggregated — cannot finish in 1s; must be cancelled.
        with pytest.raises(QueryTimeoutError):
            slow_engine.execute_query(
                "SELECT SUM(a.l_quantity * b.l_extendedprice * c.l_discount) "
                "FROM lineitem a, lineitem b, lineitem c"
            )


class TestCatalogRefresh:
    def test_manifest_missing_returns_empty(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        assert cat.read_manifest() == {}

    def test_plain_dir_resolution(self, spark, sf_small):
        cat = SnapshotCatalog(spark, sf_small)
        assert cat.refresh() == sf_small
        # second call within TTL is a no-op returning the cached dir
        assert cat.refresh() == sf_small


class TestRateLimiter:
    """C12 — reference defaults: 50 req/min per client
    (api-service/src/rate_limiter.py:15-24, config.py:22-23)."""

    def _limiter(self, max_requests=3, window_s=60.0):
        from ser_etl_spark.gateway.access import RateLimiter

        t = {"now": 1000.0}
        lim = RateLimiter(max_requests, window_s, clock=lambda: t["now"])
        return lim, t

    def test_allows_up_to_budget_then_rejects(self):
        from ser_etl_spark.gateway.access import RateLimitExceeded

        lim, _ = self._limiter(3)
        for _ in range(3):
            lim.check("1.2.3.4")
        with pytest.raises(RateLimitExceeded):
            lim.check("1.2.3.4")

    def test_window_slides(self):
        from ser_etl_spark.gateway.access import RateLimitExceeded

        lim, t = self._limiter(2, window_s=60)
        lim.check("c")
        t["now"] += 30
        lim.check("c")
        with pytest.raises(RateLimitExceeded):
            lim.check("c")
        t["now"] += 31  # first hit ages out (61s old), second is 31s old
        lim.check("c")
        with pytest.raises(RateLimitExceeded):
            lim.check("c")

    def test_clients_are_independent(self):
        from ser_etl_spark.gateway.access import RateLimitExceeded

        lim, _ = self._limiter(1)
        lim.check("a")
        lim.check("b")
        with pytest.raises(RateLimitExceeded):
            lim.check("a")

    def test_rejected_requests_do_not_consume_budget(self):
        from ser_etl_spark.gateway.access import RateLimitExceeded

        lim, t = self._limiter(1, window_s=60)
        lim.check("c")
        for _ in range(5):
            with pytest.raises(RateLimitExceeded):
                lim.check("c")
        t["now"] += 61
        lim.check("c")  # would fail if rejections had been recorded


class TestAuth:
    """C10/C11 — JWT flow + scope check in the reference's shape
    (api-service/src/auth.py:27-120)."""

    def _jwks_auth(self):
        from ser_etl_spark.gateway.access import JwksAuthenticator

        jwks = {"keys": [{"kid": "k1", "n": "modulus"}]}
        fetches = []

        def fetch():
            fetches.append(1)
            return jwks

        def decode(token, jwk, audience, issuer):
            # fake of pyjwt's verified decode: the token IS its payload
            payload = dict(item.split("=") for item in token.split(";") if "=" in item)
            if payload.pop("sig", None) != jwk["n"]:
                raise ValueError("bad signature")
            if payload.get("aud") != audience or payload.get("iss") != issuer:
                raise ValueError("bad aud/iss")
            return payload

        def header(token):
            if "kid=" not in token:
                raise ValueError("no header")
            return {"kid": dict(i.split("=") for i in token.split(";") if "=" in i)["kid"]}

        auth = JwksAuthenticator(
            fetch_jwks=fetch,
            decode=decode,
            header_reader=header,
            audience="analytics-api",
            issuer="https://tenant.example/",
        )
        return auth, fetches

    def _token(self, **over):
        base = {
            "kid": "k1", "sig": "modulus", "aud": "analytics-api",
            "iss": "https://tenant.example/", "sub": "user1",
            "scope": "read:analytics openid",
        }
        base.update(over)
        return ";".join(f"{k}={v}" for k, v in base.items())

    def test_valid_token_yields_claims(self):
        auth, _ = self._jwks_auth()
        claims = auth.authenticate(self._token())
        assert claims["sub"] == "user1"

    def test_jwks_fetched_once_and_cached(self):
        auth, fetches = self._jwks_auth()
        auth.authenticate(self._token())
        auth.authenticate(self._token())
        assert len(fetches) == 1

    def test_unknown_kid_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        auth, _ = self._jwks_auth()
        with pytest.raises(AuthError, match="signing key"):
            auth.authenticate(self._token(kid="nope"))

    def test_bad_signature_audience_issuer_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        auth, _ = self._jwks_auth()
        for bad in (
            self._token(sig="forged"),
            self._token(aud="other-api"),
            self._token(iss="https://evil.example/"),
        ):
            with pytest.raises(AuthError, match="Invalid token"):
                auth.authenticate(bad)

    def test_garbage_token_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        auth, _ = self._jwks_auth()
        with pytest.raises(AuthError, match="header"):
            auth.authenticate("not-a-jwt")

    def test_scope_check_accepts_and_rejects(self):
        from ser_etl_spark.gateway.access import ScopeError, require_scope

        claims = {"scope": "read:analytics openid", "sub": "u"}
        assert require_scope(claims, "read:analytics") is claims
        with pytest.raises(ScopeError, match="write:analytics"):
            require_scope(claims, "write:analytics")
        with pytest.raises(ScopeError):
            require_scope({}, "read:analytics")


class TestGatewayFront:
    """The composed stack: auth -> scope -> rate limit -> engine, with a
    structured log line per request (C13, main.py:57-75)."""

    def _front(self, engine, max_requests=100):
        from ser_etl_spark.gateway.access import (
            GatewayFront,
            RateLimiter,
            StaticTokenAuthenticator,
        )

        auth = StaticTokenAuthenticator(tokens={
            "good": {"sub": "u1", "scope": "read:analytics"},
            "noscope": {"sub": "u2", "scope": "openid"},
        })
        return GatewayFront(
            engine=engine,
            authenticator=auth,
            limiter=RateLimiter(max_requests=max_requests),
        )

    def test_authorized_query_executes(self, engine):
        front = self._front(engine)
        res = front.query("good", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")
        assert res.row_count == 1

    def test_invalid_token_is_401_before_execution(self, engine):
        from ser_etl_spark.gateway.access import AuthError

        front = self._front(engine)
        with pytest.raises(AuthError):
            front.query("bad", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")

    def test_missing_scope_is_403(self, engine):
        from ser_etl_spark.gateway.access import ScopeError

        front = self._front(engine)
        with pytest.raises(ScopeError):
            front.query("noscope", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")

    def test_rate_limit_is_429_and_skips_engine(self, engine):
        from ser_etl_spark.gateway.access import RateLimitExceeded

        front = self._front(engine, max_requests=1)
        front.query("good", "9.9.9.9", "SELECT COUNT(*) FROM lineitem")
        with pytest.raises(RateLimitExceeded):
            front.query("good", "9.9.9.9", "SELECT COUNT(*) FROM lineitem")

    def test_every_outcome_logs_one_structured_line(self, engine, caplog):
        import json as _json
        import logging

        from ser_etl_spark.gateway.access import AuthError

        front = self._front(engine)
        with caplog.at_level(logging.INFO, logger="ser_etl_spark.gateway"):
            front.query("good", "1.1.1.1", "SELECT COUNT(*) FROM lineitem")
            with pytest.raises(AuthError):
                front.query("bad", "1.1.1.1", "SELECT COUNT(*) FROM lineitem")
        lines = [_json.loads(r.message) for r in caplog.records]
        assert len(lines) == 2
        ok, denied = lines
        assert ok["status"] == "ok" and ok["client"] == "1.1.1.1"
        assert ok["duration_ms"] >= 0 and ok["pattern"]
        assert denied["status"] == "401"

    def test_health_envelope(self, engine):
        """Reference GET /health (main.py:78-82) extended with snapshot
        freshness SIGNALS: version, age vs the 120 s TTL. Topology
        (resolved path, table list) stays out of the unauthenticated
        envelope (r9 ADVICE)."""
        front = self._front(engine)
        front.query("good", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")
        h = front.health()
        assert h["status"] == "healthy" and h["timestamp"] > 0
        assert h["ttl_s"] == engine.catalog.ttl_s
        assert h["stale"] is False  # just refreshed by the query
        assert h["snapshot_age_s"] is not None and h["snapshot_age_s"] >= 0
        # plain-directory layout has no manifest version; a published
        # store would carry one — the key must exist either way
        assert "snapshot_version" in h
        # unauthenticated callers never see filesystem paths or the
        # registered-table list
        assert "snapshot_dir" not in h and "tables" not in h

    def test_health_before_first_query_is_cheap(self, spark, sf_small):
        """Liveness probes run before any query (and before any token
        exists): health must not force a snapshot resolve."""
        front = self._front(
            SparkQueryEngine(spark, SnapshotCatalog(spark, sf_small))
        )
        h = front.health()
        assert h["status"] == "healthy"
        assert "snapshot_dir" not in h and h["stale"] is True

    def test_close_releases_catalog_and_logs(self, spark, sf_small, caplog):
        """Reference shutdown hook (main.py:133-137): close() drops the
        catalog's cache pins and resolved state, logs the shutdown, and
        leaves the front reusable (next query re-resolves)."""
        import json as _json
        import logging

        catalog = SnapshotCatalog(spark, sf_small, cache_tables=True)
        eng = SparkQueryEngine(spark, catalog)
        front = self._front(eng)
        front.query("good", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")
        assert catalog._cached  # pins exist while serving
        with caplog.at_level(logging.INFO, logger="ser_etl_spark.gateway"):
            front.close()
        assert catalog._cached == ()
        assert front.health()["snapshot_version"] is None
        events = [_json.loads(r.message)["event"] for r in caplog.records]
        assert "gateway.shutdown" in events
        # reusable: the next query re-resolves and re-pins
        res = front.query("good", "1.2.3.4", "SELECT COUNT(*) FROM lineitem")
        assert res.row_count == 1 and catalog._cached
        # close again (idempotent) so the shared session leaves no cache
        # pins behind — a pinned parquet relation would make every later
        # same-path read in the suite resolve to InMemoryRelation and
        # break scan-shape plan assertions
        front.close()
        assert catalog._cached == ()


class TestTimeTravel:
    """A12: versioned snapshots stay readable until retention (zero-copy
    time travel through the catalog)."""

    def test_read_version_sees_historic_data(self, spark, sf_small, tmp_path):
        import shutil

        from ser_etl_spark.etl.build import build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.gateway.catalog import SnapshotCatalog
        from ser_etl_spark.sources.parquet import load_table

        store = str(tmp_path / "store")
        orders = load_table(spark, sf_small, "orders")

        build1 = str(tmp_path / "b1")
        build_snapshot({"orders": orders.limit(100)}, build1, views={})
        m1 = publish_snapshot(build1, store, tables={"orders": 100}, views={})

        build2 = str(tmp_path / "b2")
        build_snapshot({"orders": orders.limit(200)}, build2, views={})
        m2 = publish_snapshot(build2, store, tables={"orders": 200}, views={})

        cat = SnapshotCatalog(spark, store)
        assert cat.versions()[0] == m2["version"]
        assert m1["version"] in cat.versions()
        # current serves v2; time travel reads v1 unchanged
        cat.refresh(force=True)
        assert spark.table("orders").count() == 200
        assert cat.read_version(m1["version"], "orders").count() == 100

    def test_unknown_version_raises(self, spark, sf_small, tmp_path):
        import pytest as _pytest

        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        cat = SnapshotCatalog(spark, str(tmp_path / "nostore"))
        with _pytest.raises(FileNotFoundError):
            cat.read_version("19990101_000000_000000", "orders")


# ---------------------------------------------------------------------------
# C10 crypto parity: real RS256 verification (gateway/jwt_rs256.py)
# ---------------------------------------------------------------------------

import functools
import hashlib
import json as _json
import random as _random


@functools.lru_cache(maxsize=4)
def _rsa_keypair(seed: int = 7, bits: int = 1024):
    """Deterministic throwaway RSA keypair (tests only): Miller-Rabin
    primes from a seeded PRNG, e=65537. Pure stdlib — the whole point is
    proving the verifier needs no crypto library."""
    rng = _random.Random(seed)

    def is_probable_prime(n, rounds=40):
        small = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)
        for p in small:
            if n % p == 0:
                return n == p
        d, r = n - 1, 0
        while d % 2 == 0:
            d //= 2
            r += 1
        for _ in range(rounds):
            a = rng.randrange(2, n - 1)
            x = pow(a, d, n)
            if x in (1, n - 1):
                continue
            for _ in range(r - 1):
                x = x * x % n
                if x == n - 1:
                    break
            else:
                return False
        return True

    def gen_prime(b):
        while True:
            c = rng.getrandbits(b) | (1 << (b - 1)) | 1
            if is_probable_prime(c):
                return c

    e = 65537
    while True:
        p, q = gen_prime(bits // 2), gen_prime(bits // 2)
        if p == q:
            continue
        lam = (p - 1) * (q - 1)
        if lam % e:
            d = pow(e, -1, lam)
            return {"n": p * q, "e": e, "d": d}


class TestRs256:
    """End-to-end RSASSA-PKCS1-v1_5 / SHA-256 verification: sign with a
    generated private exponent, verify through the default
    JwksAuthenticator path (no injected fakes)."""

    AUD = "analytics-api"
    ISS = "https://tenant.example/"

    def _jwk(self, kp, kid="rsa1"):
        from ser_etl_spark.gateway.jwt_rs256 import b64url_encode

        k = (kp["n"].bit_length() + 7) // 8
        return {
            "kid": kid,
            "kty": "RSA",
            "n": b64url_encode(kp["n"].to_bytes(k, "big")),
            "e": b64url_encode(kp["e"].to_bytes(3, "big")),
        }

    def _sign(self, signing_input: bytes, kp) -> bytes:
        from ser_etl_spark.gateway.jwt_rs256 import _SHA256_DIGEST_INFO

        k = (kp["n"].bit_length() + 7) // 8
        t = _SHA256_DIGEST_INFO + hashlib.sha256(signing_input).digest()
        em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
        return pow(int.from_bytes(em, "big"), kp["d"], kp["n"]).to_bytes(
            k, "big"
        )

    def _token(self, kp, claims=None, header=None):
        from ser_etl_spark.gateway.jwt_rs256 import b64url_encode

        base = {
            "sub": "user1", "aud": self.AUD, "iss": self.ISS,
            "scope": "read:analytics",
        }
        base.update(claims or {})
        header = header or {"alg": "RS256", "kid": "rsa1"}
        h64 = b64url_encode(_json.dumps(header).encode())
        p64 = b64url_encode(_json.dumps(base).encode())
        sig = self._sign(f"{h64}.{p64}".encode(), kp)
        return f"{h64}.{p64}.{b64url_encode(sig)}"

    def _auth(self, kp):
        from ser_etl_spark.gateway.access import JwksAuthenticator

        return JwksAuthenticator(
            fetch_jwks=lambda: {"keys": [self._jwk(kp)]},
            audience=self.AUD,
            issuer=self.ISS,
        )

    def test_signed_token_verifies_through_default_path(self):
        kp = _rsa_keypair()
        claims = self._auth(kp).authenticate(self._token(kp))
        assert claims["sub"] == "user1"

    def test_tampered_payload_rejected(self):
        from ser_etl_spark.gateway.access import AuthError
        from ser_etl_spark.gateway.jwt_rs256 import b64url_encode

        kp = _rsa_keypair()
        h64, p64, sig = self._token(kp).split(".")
        forged = b64url_encode(
            _json.dumps({"sub": "admin", "aud": self.AUD, "iss": self.ISS}).encode()
        )
        with pytest.raises(AuthError):
            self._auth(kp).authenticate(f"{h64}.{forged}.{sig}")

    def test_signature_from_other_key_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        kp, other = _rsa_keypair(), _rsa_keypair(seed=11)
        with pytest.raises(AuthError):
            self._auth(kp).authenticate(self._token(other))

    def test_alg_confusion_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        kp = _rsa_keypair()
        for alg in ("none", "HS256"):
            tok = self._token(kp, header={"alg": alg, "kid": "rsa1"})
            with pytest.raises(AuthError):
                self._auth(kp).authenticate(tok)

    def test_exp_nbf_with_leeway(self):
        from ser_etl_spark.gateway.access import AuthError
        from ser_etl_spark.gateway.jwt_rs256 import decode_rs256

        kp = _rsa_keypair()
        jwk = self._jwk(kp)
        expired = self._token(kp, claims={"exp": 1000})
        with pytest.raises(AuthError, match="expired"):
            decode_rs256(expired, jwk, self.AUD, self.ISS, now=2000)
        # inside leeway: accepted
        decode_rs256(expired, jwk, self.AUD, self.ISS, now=1010)
        future = self._token(kp, claims={"nbf": 5000})
        with pytest.raises(AuthError, match="not yet valid"):
            decode_rs256(future, jwk, self.AUD, self.ISS, now=1000)

    def test_aud_list_membership_and_iss(self):
        from ser_etl_spark.gateway.access import AuthError

        kp = _rsa_keypair()
        ok = self._token(kp, claims={"aud": [self.AUD, "other"]})
        assert self._auth(kp).authenticate(ok)["sub"] == "user1"
        for bad in (
            self._token(kp, claims={"aud": "other-api"}),
            self._token(kp, claims={"iss": "https://evil.example/"}),
        ):
            with pytest.raises(AuthError):
                self._auth(kp).authenticate(bad)

    def test_malformed_structures_rejected(self):
        from ser_etl_spark.gateway.access import AuthError

        kp = _rsa_keypair()
        auth = self._auth(kp)
        h64, p64, sig = self._token(kp).split(".")
        for bad in (f"{h64}.{p64}", "not-a-jwt", f"{h64}.{p64}.AAAA"):
            with pytest.raises(AuthError):
                auth.authenticate(bad)

    def test_non_rsa_jwk_rejected(self):
        from ser_etl_spark.gateway.access import AuthError
        from ser_etl_spark.gateway.jwt_rs256 import verify_rs256_signature

        with pytest.raises(AuthError, match="not an RSA key"):
            verify_rs256_signature(b"x", b"y", {"kty": "EC"})


class TestVersionDiff:
    def _publish_two(self, spark, tmp_path):
        from ser_etl_spark.etl.build import build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot

        store = str(tmp_path / "store")
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
        )
        v2 = spark.createDataFrame(
            [(2, "b"), (3, "CHANGED"), (4, "d")], "id bigint, v string"
        )
        for i, df in enumerate((v1, v2), start=1):
            out = str(tmp_path / f"b{i}")
            r = build_snapshot({"t": df}, out, views={})
            publish_snapshot(
                out, store, tables=r.tables, views={},
                version=f"2024010{i}_000000",
            )
        return store

    def test_added_removed_changed(self, spark, tmp_path):
        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        store = self._publish_two(spark, tmp_path)
        cat = SnapshotCatalog(spark, store)
        got = {
            r["id"]: r["change"]
            for r in cat.diff_versions(
                "20240101_000000", "20240102_000000", "t", "id"
            ).collect()
        }
        # key 2 is unchanged -> absent
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_null_placement_moves_are_detected(self, spark, tmp_path):
        """xxhash64 skips null inputs, so a bare column hash can't tell
        (x, NULL) from (NULL, x) — the JSON-struct fingerprint keys each
        value by column name and must flag such rows as changed."""
        from ser_etl_spark.etl.build import build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        store = str(tmp_path / "store_nulls")
        v1 = spark.createDataFrame(
            [(1, "x", None), (2, None, "y")], "id bigint, a string, b string"
        )
        # value moves between columns / null swaps with the neighbor
        v2 = spark.createDataFrame(
            [(1, None, "x"), (2, "y", None)], "id bigint, a string, b string"
        )
        for i, df in enumerate((v1, v2), start=1):
            out = str(tmp_path / f"bn{i}")
            r = build_snapshot({"t": df}, out, views={})
            publish_snapshot(
                out, store, tables=r.tables, views={},
                version=f"2024010{i}_000000",
            )
        cat = SnapshotCatalog(spark, store)
        got = {
            r["id"]: r["change"]
            for r in cat.diff_versions(
                "20240101_000000", "20240102_000000", "t", "id"
            ).collect()
        }
        assert got == {1: "changed", 2: "changed"}


class TestServingCache:
    def test_tables_pinned_and_repinned_across_versions(self, spark, tmp_path):
        from ser_etl_spark.etl.build import build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        store = str(tmp_path / "store")

        def publish(n, version):
            df = spark.range(n).withColumnRenamed("id", "k")
            out = str(tmp_path / f"b_{version}")
            r = build_snapshot({"t": df}, out, views={})
            publish_snapshot(out, store, tables=r.tables, views={}, version=version)

        publish(100, "20240101_000000")
        cat = SnapshotCatalog(spark, store, cache_tables=True)
        cat.refresh(force=True)
        assert spark.catalog.isCached("t")
        assert spark.table("t").count() == 100

        publish(200, "20240102_000000")
        cat.refresh(force=True)
        # new version: re-pinned, serving fresh data (never stale cache)
        assert spark.catalog.isCached("t")
        assert spark.table("t").count() == 200
        spark.catalog.uncacheTable("t")

    def test_caller_owned_views_are_never_pinned(self, spark, tmp_path):
        """cache_tables pins exactly the views the catalog registered —
        a temp view the CALLER created in the shared session must not be
        pinned on refresh (unintended memory) nor uncached on the next
        version change (cache eviction of caller state)."""
        from ser_etl_spark.etl.build import build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        store = str(tmp_path / "store2")

        def publish(n, version):
            df = spark.range(n).withColumnRenamed("id", "k")
            out = str(tmp_path / f"c_{version}")
            r = build_snapshot({"t": df}, out, views={})
            publish_snapshot(out, store, tables=r.tables, views={}, version=version)

        spark.range(10).createOrReplaceTempView("caller_owned_view")
        spark.catalog.cacheTable("caller_owned_view")
        try:
            publish(100, "20240101_000000")
            cat = SnapshotCatalog(spark, store, cache_tables=True)
            cat.refresh(force=True)
            assert "caller_owned_view" not in cat._cached
            publish(200, "20240102_000000")
            cat.refresh(force=True)
            # the caller's pin survived the catalog's repin cycle
            assert spark.catalog.isCached("caller_owned_view")
            spark.catalog.uncacheTable("t")
        finally:
            spark.catalog.uncacheTable("caller_owned_view")
            spark.catalog.dropTempView("caller_owned_view")


class TestExplain:
    def test_explain_returns_plan_without_running(self, spark, sf_small):
        from ser_etl_spark.gateway.catalog import SnapshotCatalog
        from ser_etl_spark.gateway.executor import SparkQueryEngine

        engine = SparkQueryEngine(spark, SnapshotCatalog(spark, sf_small))
        plan = engine.explain_query(
            "SELECT o_orderpriority, COUNT(*) AS n FROM orders "
            "WHERE o_totalprice > 1000 GROUP BY o_orderpriority"
        )
        assert "PushedFilters" in plan or "Filter" in plan
        assert "HashAggregate" in plan
        # the explained plan carries the SAME admission row cap the
        # executor applies, so what you explain is what actually runs
        assert "CollectLimit" in plan or "TakeOrderedAndProject" in plan

    def test_explain_is_gated_by_the_same_validator(self, spark, sf_small):
        from ser_etl_spark.gateway.catalog import SnapshotCatalog
        from ser_etl_spark.gateway.executor import SparkQueryEngine
        from ser_etl_spark.gateway.validator import QueryRejected

        engine = SparkQueryEngine(spark, SnapshotCatalog(spark, sf_small))
        with pytest.raises(QueryRejected):
            engine.explain_query("DROP TABLE orders")


class TestSnapshotAnnIndex:
    """Directive-r7 #3: the serving path must exercise the same ANN
    artifact the ETL publishes — probes through a published snapshot
    resolve `<table>_ann_index` with ZERO on-demand rebuild, including
    after an `upsert_ann_index` delta."""

    def _publish_with_index(self, spark, sf_small, tmp_path):
        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.gateway.catalog import SnapshotCatalog
        from ser_etl_spark.sources.parquet import load_table

        emb = load_table(spark, sf_small, "embeddings")
        build = str(tmp_path / "build")
        report = build_snapshot(
            {"embeddings": emb},
            build,
            layouts={
                "embeddings": TableLayout(unique_key="vec_id", ann_index=True)
            },
            views={},
        )
        store = str(tmp_path / "store")
        publish_snapshot(build, store, tables=report.tables, views={})
        return SnapshotCatalog(spark, store)

    def test_probe_reads_published_index_zero_rebuild(
        self, spark, sf_small, tmp_path
    ):
        import os
        import tempfile

        from ser_etl_spark.operators import similarity as S

        cat = self._publish_with_index(spark, sf_small, tmp_path)
        snap = cat.refresh()
        idx = cat.ann_index_dir()
        assert idx == os.path.join(snap, "embeddings_ann_index")
        # ensure_ann_index resolves the SAME published artifact
        assert S.ensure_ann_index(spark, snap) == idx

        uid = getattr(os, "getuid", lambda: "na")()
        cache_root = os.path.join(
            tempfile.gettempdir(), f"ser_etl_ann_index_{uid}"
        )
        before = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        vec = S._query_vector(spark, snap)
        assert len(S.lsh_ann_topk_indexed(spark, snap, vec, k=10).collect()) > 0
        assert len(S.ivf_ann_topk_indexed(spark, snap, vec, k=10).collect()) > 0
        assert (
            len(S.quantized_rescore_topk_indexed(spark, snap, vec).collect())
            > 0
        )
        after = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert before == after  # zero on-demand rebuild

    def test_snapshot_without_index_returns_none(self, spark, sf_small):
        from ser_etl_spark.gateway.catalog import SnapshotCatalog

        cat = SnapshotCatalog(spark, sf_small)  # plain fixture dir, no index
        assert cat.ann_index_dir() is None


class TestSnapshotTextArtifacts:
    """r8: the band table and postings index resolve through the catalog
    with the same published-first + freshness contract as the ANN
    index, and BM25 through a published snapshot rebuilds nothing."""

    def test_published_artifacts_resolve_and_serve(
        self, spark, sf_small, tmp_path
    ):
        import os
        import tempfile

        from ser_etl_spark.etl.build import TableLayout, build_snapshot
        from ser_etl_spark.etl.publish import publish_snapshot
        from ser_etl_spark.operators.text import bm25_search_indexed
        from ser_etl_spark.sources.parquet import load_table

        docs = load_table(spark, sf_small, "documents")
        build = str(tmp_path / "build")
        report = build_snapshot(
            {"documents": docs},
            build,
            layouts={
                "documents": TableLayout(
                    unique_key="doc_id",
                    minhash_bands=True,
                    text_postings=True,
                )
            },
            views={},
        )
        store = str(tmp_path / "store")
        publish_snapshot(build, store, tables=report.tables, views={})
        cat = SnapshotCatalog(spark, store)
        snap = cat.refresh()
        assert cat.minhash_bands_dir() == os.path.join(
            snap, "documents_minhash_bands"
        )
        posts = cat.text_postings_dir()
        assert posts == os.path.join(snap, "documents_text_postings")

        uid = getattr(os, "getuid", lambda: "na")()
        cache_root = os.path.join(
            tempfile.gettempdir(), f"ser_etl_text_postings_{uid}"
        )
        before = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert len(bm25_search_indexed(spark, snap).collect()) > 0
        after = (
            set(os.listdir(cache_root)) if os.path.isdir(cache_root) else set()
        )
        assert before == after  # zero on-demand rebuild through the snapshot

    def test_plain_dir_returns_none(self, spark, sf_small):
        cat = SnapshotCatalog(spark, sf_small)
        assert cat.minhash_bands_dir() is None
        assert cat.text_postings_dir() is None


class TestHttpIngress:
    """The framework-free WSGI binding (r9 directive #5): route →
    status-code → envelope parity with the reference's FastAPI app
    (api-service/src/main.py:78-130), driven in-process."""

    def _app(self, engine, max_requests=100):
        from ser_etl_spark.gateway.access import (
            GatewayFront,
            RateLimiter,
            StaticTokenAuthenticator,
        )
        from ser_etl_spark.gateway.http import GatewayHTTP

        auth = StaticTokenAuthenticator(tokens={
            "good": {"sub": "u1", "scope": "read:analytics"},
            "noscope": {"sub": "u2", "scope": "openid"},
        })
        return GatewayHTTP(GatewayFront(
            engine=engine,
            authenticator=auth,
            limiter=RateLimiter(max_requests=max_requests),
        ))

    @staticmethod
    def _get(app, path, q=None, token=None, fwd=None, method="GET",
             headers=None):
        import json as _json
        from urllib.parse import quote

        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "QUERY_STRING": f"q={quote(q)}" if q else "",
            "REMOTE_ADDR": "9.9.9.9",
        }
        if token is not None:
            environ["HTTP_AUTHORIZATION"] = f"Bearer {token}"
        if fwd is not None:
            environ["HTTP_X_FORWARDED_FOR"] = fwd
        for k, v in (headers or {}).items():
            environ["HTTP_" + k.upper().replace("-", "_")] = v
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = dict(headers)

        body = b"".join(app(environ, start_response))
        return captured["status"], _json.loads(body), captured["headers"]

    def test_query_success_envelope(self, engine):
        app = self._app(engine)
        st, body, headers = self._get(
            app, "/query", q="SELECT COUNT(*) AS n FROM lineitem",
            token="good",
        )
        assert st == 200
        assert body["success"] is True and body["row_count"] == 1
        assert body["columns"] == ["n"] and body["data"][0]["n"] > 0
        assert body["execution_time_ms"] > 0
        assert headers["Content-Type"] == "application/json"

    def test_status_code_mapping(self, engine):
        """The reference's table: 400 validation, 401 auth, 403 scope,
        429 rate limit, 404/405 routing, 400 missing param."""
        app = self._app(engine, max_requests=2)
        good_q = "SELECT COUNT(*) AS n FROM lineitem"
        # 401: no header at all, and an unknown token (no limiter spend:
        # auth precedes the rate limit, like the reference's Depends)
        assert self._get(app, "/query", q=good_q)[0] == 401
        assert self._get(app, "/query", q=good_q, token="bad")[0] == 401
        # 403: authenticated but missing read:analytics
        st, body, _ = self._get(app, "/query", q=good_q, token="noscope")
        assert st == 403 and "scope" in body["detail"].lower()
        # 400: missing q (parameter check — no limiter spend)
        assert self._get(app, "/query", token="good")[0] == 400
        # 400: validator rejects DML. This DOES spend rate-limit budget —
        # the limiter runs at the route boundary, before validation,
        # exactly like the reference's slowapi decorator (spend 1 of 2)
        st, body, _ = self._get(
            app, "/query", q="DROP TABLE lineitem", token="good"
        )
        assert st == 400 and body["detail"]
        # 429: the window (2) is exhausted by the 400 above + one 200
        assert self._get(app, "/query", q=good_q, token="good")[0] == 200
        st, body, _ = self._get(app, "/query", q=good_q, token="good")
        assert st == 429 and "Rate limit exceeded" in body["detail"]
        # routing
        assert self._get(app, "/nope")[0] == 404
        assert self._get(app, "/query", q=good_q, token="good",
                         method="POST")[0] == 405

    def test_rate_limit_keys_on_forwarded_client(self, engine):
        """forwarded_allow_ips='*' behavior: X-Forwarded-For's first hop
        is the client key, so distinct proxied clients have distinct
        budgets."""
        app = self._app(engine, max_requests=1)
        q = "SELECT COUNT(*) AS n FROM lineitem"
        assert self._get(app, "/query", q=q, token="good",
                         fwd="1.1.1.1, 10.0.0.1")[0] == 200
        assert self._get(app, "/query", q=q, token="good",
                         fwd="2.2.2.2, 10.0.0.1")[0] == 200
        assert self._get(app, "/query", q=q, token="good",
                         fwd="1.1.1.1, 10.0.0.1")[0] == 429

    def test_health_and_schema_routes(self, engine):
        app = self._app(engine)
        st, body, _ = self._get(app, "/health")  # unauthenticated
        assert st == 200 and body["status"] == "healthy"
        assert "snapshot_dir" not in body
        # schema requires auth (Depends(get_current_user))
        assert self._get(app, "/schema")[0] == 401
        st, body, _ = self._get(app, "/schema", token="good")
        assert st == 200 and "lineitem" in body["schema"]
        assert "l_orderkey" in body["schema"]["lineitem"]

    def test_500_hides_execution_internals(self, engine):
        """An admitted query that fails at execution maps to a bare 500
        'Query execution failed' (main.py:129-130 — no str(e))."""
        app = self._app(engine)
        st, body, _ = self._get(
            app, "/query",
            q="SELECT COUNT(*) AS n FROM no_such_table_anywhere",
            token="good",
        )
        assert st == 500 and body["detail"] == "Query execution failed"

    def test_cors_simple_response_headers(self, engine):
        """CORSMiddleware parity (main.py:44-52, config.py:26): with the
        default allow_origins=['*'], every response to a request
        carrying an Origin gets the literal-* allow-origin plus
        allow-credentials; requests WITHOUT an Origin stay header-free."""
        app = self._app(engine)
        st, _, h = self._get(
            app, "/query", q="SELECT COUNT(*) AS n FROM lineitem",
            token="good", headers={"Origin": "https://dash.example"},
        )
        assert st == 200
        assert h["Access-Control-Allow-Origin"] == "*"
        assert h["Access-Control-Allow-Credentials"] == "true"
        # error responses are CORS-visible too (the browser needs the
        # header to expose the 401 body to the page)
        st, _, h = self._get(
            app, "/query", q="SELECT 1",
            headers={"Origin": "https://dash.example"},
        )
        assert st == 401 and h["Access-Control-Allow-Origin"] == "*"
        # no Origin → no CORS headers
        _, _, h = self._get(app, "/health")
        assert "Access-Control-Allow-Origin" not in h
        # credentialed (cookie-bearing) request under allow-all: the
        # origin is ECHOED with Vary instead of the literal * — a
        # starred credentialed response is invalid and starlette's
        # has_cookie branch echoes (r10 review finding)
        _, _, h = self._get(
            app, "/health", headers={
                "Origin": "https://dash.example", "Cookie": "sid=1",
            },
        )
        assert h["Access-Control-Allow-Origin"] == "https://dash.example"
        assert h["Vary"] == "Origin"

    def test_cors_restricted_origin_echo_and_vary(self, engine):
        """A restricted origin list echoes the matching origin (with
        Vary: Origin) and omits headers for a non-listed one."""
        from ser_etl_spark.gateway.http import GatewayHTTP

        app = self._app(engine)
        app = GatewayHTTP(app.front, cors_origins=["https://ok.example"])
        _, _, h = self._get(
            app, "/health", headers={"Origin": "https://ok.example"},
        )
        assert h["Access-Control-Allow-Origin"] == "https://ok.example"
        assert h["Vary"] == "Origin"
        # a disallowed origin is withheld the allow-origin header, but
        # the config headers (credentials, Vary) still ride — exactly
        # starlette's precomputed simple_headers
        _, _, h = self._get(
            app, "/health", headers={"Origin": "https://evil.example"},
        )
        assert "Access-Control-Allow-Origin" not in h
        assert h["Vary"] == "Origin"
        assert h["Access-Control-Allow-Credentials"] == "true"

    def test_cors_preflight(self, engine):
        """OPTIONS + Access-Control-Request-Method is answered 200
        WITHOUT auth, with the configured methods, echoed headers
        (allow_headers=['*']), and max-age; a disallowed method or
        origin gets starlette's 400; plain OPTIONS is a normal 405."""
        from ser_etl_spark.gateway.http import GatewayHTTP

        app = self._app(engine)
        st, _, h = self._get(
            app, "/query", method="OPTIONS", headers={
                "Origin": "https://dash.example",
                "Access-Control-Request-Method": "GET",
                "Access-Control-Request-Headers": "authorization",
            },
        )
        assert st == 200  # no token on the preflight, yet not 401
        # allow-all + credentials: starlette's preflight_explicit_allow_
        # origin branch ECHOES the origin with Vary: Origin — never the
        # literal '*', which browsers reject on credentialed preflights
        # (r10 ADVICE)
        assert h["Access-Control-Allow-Origin"] == "https://dash.example"
        assert h["Vary"] == "Origin"
        assert h["Access-Control-Allow-Methods"] == "GET, POST"
        assert h["Access-Control-Allow-Headers"] == "authorization"
        assert h["Access-Control-Max-Age"] == "600"
        assert h["Access-Control-Allow-Credentials"] == "true"
        # disallowed method: 400 WITH the accumulated preflight headers
        # (starlette returns its failure response headers=preflight)
        st, body, h = self._get(
            app, "/query", method="OPTIONS", headers={
                "Origin": "https://dash.example",
                "Access-Control-Request-Method": "DELETE",
            },
        )
        assert st == 400 and "CORS" in body["detail"]
        assert h["Access-Control-Allow-Methods"] == "GET, POST"
        # the echoed origin rides even a failed preflight (starlette
        # returns its failure response headers=preflight)
        assert h["Access-Control-Allow-Origin"] == "https://dash.example"
        # disallowed origin under a restricted list: 400, no allow-origin
        rapp = GatewayHTTP(app.front, cors_origins=["https://ok.example"])
        st, _, h = self._get(
            rapp, "/query", method="OPTIONS", headers={
                "Origin": "https://evil.example",
                "Access-Control-Request-Method": "GET",
            },
        )
        assert st == 400
        assert "Access-Control-Allow-Origin" not in h
        assert h["Vary"] == "Origin"
        # plain OPTIONS (no request-method header): not a preflight
        assert self._get(app, "/query", method="OPTIONS")[0] == 405
        # OPTIONS with a request-method header but NO Origin: starlette
        # gates on Origin first, so this passes through to the app (405)
        # rather than being treated as a (failed) preflight
        st, _, _ = self._get(
            app, "/query", method="OPTIONS",
            headers={"Access-Control-Request-Method": "GET"},
        )
        assert st == 405

    def test_serves_over_a_real_socket(self, engine):
        """End-to-end through the stdlib WSGI server: the same app
        answers on a real port (single-request smoke — the in-process
        contract tests above carry the full matrix)."""
        import json as _json
        import threading
        from urllib.request import Request, urlopen

        from ser_etl_spark.gateway.http import serve

        app = self._app(engine)
        srv = serve(app, "127.0.0.1", 0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.handle_request, daemon=True)
        t.start()
        req = Request(
            f"http://127.0.0.1:{port}/query?q=SELECT%20COUNT(*)%20AS%20n%20FROM%20region",
            headers={"Authorization": "Bearer good"},
        )
        with urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            body = _json.loads(resp.read())
        assert body["success"] is True and body["data"][0]["n"] > 0
        t.join(timeout=30)
        srv.server_close()
