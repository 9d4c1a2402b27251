from .catalog import Catalog
from .robots import robots_table
from .swde import (
    swde_eval_table,
    swde_ground_truth,
    swde_pages,
    truth_values_long,
)

__all__ = [
    "Catalog",
    "robots_table",
    "swde_eval_table",
    "swde_ground_truth",
    "swde_pages",
    "truth_values_long",
]
