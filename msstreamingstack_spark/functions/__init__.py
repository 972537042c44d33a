from msstreamingstack_spark.functions.expressions import (  # noqa: F401
    DEVICE_RULES,
    USER_AGENTS,
    classify_device,
    classify_device_sql,
    normalize_platform,
    normalize_platform_sql,
    session_id_expr,
    synthetic_user_agent,
    synthetic_user_agent_sql,
)
