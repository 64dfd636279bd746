from .scalars import dsum, davg, portable_hash64, fmt_date  # noqa: F401
