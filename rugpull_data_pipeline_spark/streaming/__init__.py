from .pipelines import (  # noqa: F401
    price_change_events,
    stream_balance_pipeline,
    watermarked_dedup,
)
