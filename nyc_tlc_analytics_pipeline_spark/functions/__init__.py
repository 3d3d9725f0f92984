from .scalar import (
    day_of_week,
    epoch_minutes,
    is_weekend,
    money,
    nullif_div,
    r4,
    r6,
    to_epoch,
    to_epoch_seconds,
)

__all__ = [
    "day_of_week",
    "epoch_minutes",
    "is_weekend",
    "money",
    "nullif_div",
    "r4",
    "r6",
    "to_epoch",
    "to_epoch_seconds",
]
