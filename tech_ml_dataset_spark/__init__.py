"""tech_ml_dataset_spark — a PySpark-native analytics engine with the
capabilities of techascent/tech.ml.dataset (reference studied read-only at
/root/reference; see SURVEY.md). Spark-first: every operator compiles to
DataFrame/SQL expressions planned by Catalyst; Python touches data only
through Arrow-batched UDFs where semantics demand it.
"""

from .dataset import Dataset, dataset
from .session import get_spark
from .sources.io import load_tables, register_views, to_dataset, write

__all__ = [
    "Dataset",
    "dataset",
    "get_spark",
    "load_tables",
    "register_views",
    "to_dataset",
    "write",
]

__version__ = "0.1.0"
