from .ledger import append_result, load_results, save_curves
from .checkpoint import (
    save_params,
    load_params,
    save_train_state,
    load_train_state,
)
