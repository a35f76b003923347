from . import aggregates, rules  # noqa: F401
