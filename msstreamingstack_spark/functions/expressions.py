"""Scalar expression library (SURVEY.md §2.3 P1-P16, §2.7 U1).

Every derivation the reference computes per event, expressed as
composable Column functions — JVM-side, whole-stage-codegen friendly,
no Python UDFs. Each function that feeds an oracle-checked query has a
``*_sql`` twin generated from the SAME rule table, so the Spark plan
and the DuckDB oracle cannot drift.

Reference citations:
- platform normalization (P7):  StructuredStreaming.scala:96-100
- device classification (P8):   StructuredStreaming.scala:101-115
  (case-sensitive LIKE, first-match-wins: Windows → android → iPhone
  → iPad → Mac; labels "Windows PC"/"Android"/"iPhone"/"iPad"/"iMac"/
  "Others")
- session-id generation (U1):   StructuredStreaming.scala:283-296
  (non-deterministic wall-clock/RNG in the reference; deterministic
  ``<user>-<session_start_epoch>`` here per FIXTURES.md §F5)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# P8: device classification. Rule table is the single source of truth
# for the Spark when-chain AND the oracle SQL CASE. Order matters
# (e.g. an iPad UA containing "Mac" must hit the iPad arm first — the
# reference checks iPad before Mac).
# ---------------------------------------------------------------------------
DEVICE_RULES: tuple[tuple[str, str], ...] = (
    ("%Windows%", "Windows PC"),
    ("%android%", "Android"),
    ("%iPhone%", "iPhone"),
    ("%iPad%", "iPad"),
    ("%Mac%", "iMac"),
)
DEVICE_DEFAULT = "Others"

# Synthetic user-agent pool for the driver's `events` table (which has
# no UA column): chosen to exercise every rule arm, the iPad-before-Mac
# ordering, the case-sensitive lowercase `%android%` arm, and the
# default arm. Indexed by a deterministic key (prop_k % len).
USER_AGENTS: tuple[str, ...] = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Mozilla/5.0 (Linux; android 13; Pixel 7) AppleWebKit/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) AppleWebKit/605.1.15",
    "Mozilla/5.0 (iPad; CPU OS 16_5 like Mac OS X) AppleWebKit/605.1.15",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_4) AppleWebKit/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/113.0",
    "Mozilla/5.0 (Linux; Android 12; SM-G991B) AppleWebKit/537.36",
)


def classify_device(user_agent: Column) -> Column:
    """First-match-wins LIKE chain over DEVICE_RULES (case-sensitive)."""
    expr: Column | None = None
    for pattern, label in DEVICE_RULES:
        arm = user_agent.like(pattern)
        expr = F.when(arm, F.lit(label)) if expr is None else expr.when(arm, F.lit(label))
    assert expr is not None
    return expr.otherwise(F.lit(DEVICE_DEFAULT))


def classify_device_sql(user_agent_sql: str) -> str:
    arms = "\n        ".join(
        f"WHEN {user_agent_sql} LIKE '{p}' THEN '{label}'" for p, label in DEVICE_RULES
    )
    return f"CASE {arms}\n        ELSE '{DEVICE_DEFAULT}' END"


def synthetic_user_agent(key: Column) -> Column:
    """Deterministic UA drawn from USER_AGENTS by ``key % pool``.

    Stands in for the clickstream `user_agent` field on the driver's
    `events` table (FIXTURES.md §F4); pure column arithmetic so the
    oracle can reproduce it.
    """
    n = len(USER_AGENTS)
    expr = F.when(key % n == 0, F.lit(USER_AGENTS[0]))
    for i in range(1, n):
        expr = expr.when(key % n == i, F.lit(USER_AGENTS[i]))
    return expr.otherwise(F.lit(USER_AGENTS[0]))


def synthetic_user_agent_sql(key_sql: str) -> str:
    n = len(USER_AGENTS)
    arms = "\n        ".join(
        f"WHEN ({key_sql}) % {n} = {i} THEN '{ua}'" for i, ua in enumerate(USER_AGENTS)
    )
    return f"CASE {arms}\n        ELSE '{USER_AGENTS[0]}' END"


# ---------------------------------------------------------------------------
# P7: platform normalization — two known platforms, MOBILE else WEB.
# ---------------------------------------------------------------------------
def normalize_platform(platform: Column) -> Column:
    return F.when(platform == "MOBILE", F.lit("MOBILE")).otherwise(F.lit("WEB"))


def normalize_platform_sql(platform_sql: str) -> str:
    return f"CASE WHEN {platform_sql} = 'MOBILE' THEN 'MOBILE' ELSE 'WEB' END"


# ---------------------------------------------------------------------------
# U1: deterministic session id — `<user_id>-<session_start_epoch_sec>`.
# The reference's UDF stamps wall-clock millis (or a RNG int for empty
# users); made injectable+deterministic for oracle checking.
# ---------------------------------------------------------------------------
def session_id_expr(user_id: Column, session_start_sec: Column) -> Column:
    return F.concat_ws("-", user_id.cast("string"), session_start_sec.cast("string"))
