from .text_pipeline import preprocess_documents  # noqa: F401
from .metrics import threshold_metrics, best_f1  # noqa: F401
from .p1 import pair_features, run_p1  # noqa: F401
from .p2 import run_p2  # noqa: F401
