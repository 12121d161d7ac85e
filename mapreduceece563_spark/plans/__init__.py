from .explain import plan_report, plan_string  # noqa: F401
