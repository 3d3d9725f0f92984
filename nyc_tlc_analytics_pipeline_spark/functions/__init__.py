from .scalar import day_of_week, epoch_minutes, is_weekend, money, nullif_div, r4, r6

__all__ = ["day_of_week", "epoch_minutes", "is_weekend", "money", "nullif_div", "r4", "r6"]
