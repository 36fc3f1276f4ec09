from fm3dgan.utils.analysis import (
    load_training_log,
    metric_curve,
    build_manipulator_from_checkpoint,
)
from fm3dgan.utils.experiment import (
    print_experiment_status,
    setup_experiment_dir,
)

__all__ = [
    "load_training_log",
    "metric_curve",
    "build_manipulator_from_checkpoint",
    "print_experiment_status",
    "setup_experiment_dir",
]
