"""Query gateway: validation, execution envelope, catalog over snapshots.

The thin layer the reference wraps around its executor — SQL whitelist /
blocklist validation, row caps, timeouts, result envelopes, schema
introspection — reimplemented over ``spark.sql``.
"""

from ser_etl_spark.gateway.access import (
    AuthError,
    GatewayFront,
    JwksAuthenticator,
    RateLimiter,
    RateLimitExceeded,
    ScopeError,
    StaticTokenAuthenticator,
    require_scope,
)
from ser_etl_spark.gateway.catalog import SnapshotCatalog
from ser_etl_spark.gateway.executor import (
    QueryResult,
    QueryTimeoutError,
    SparkQueryEngine,
)
from ser_etl_spark.gateway.validator import (
    QueryRejected,
    QueryValidator,
    sanitize_query,
)

__all__ = [
    "AuthError",
    "GatewayFront",
    "JwksAuthenticator",
    "QueryResult",
    "QueryRejected",
    "QueryTimeoutError",
    "QueryValidator",
    "RateLimiter",
    "RateLimitExceeded",
    "ScopeError",
    "SnapshotCatalog",
    "SparkQueryEngine",
    "StaticTokenAuthenticator",
    "require_scope",
    "sanitize_query",
]
