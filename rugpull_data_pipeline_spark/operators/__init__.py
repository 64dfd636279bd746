from .balance import extract_balance_changes  # noqa: F401
