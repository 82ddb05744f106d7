"""TPU-native deep-unfolded D-ADMM framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference PyTorch
repo `Razyehuda/Hyperparameter-GNN_unfolded-D-ADMM`: distributed LASSO and distributed
linear regression over Erdos-Renyi agent graphs, with per-iteration hyperparameters
that are fixed, learned as cumsum-sigmoid tables, or emitted per agent per iteration by
a GNN hypernetwork (progressive-K training). The P agents and the scenario batch shard
across TPU meshes; consensus is a graph-Laplacian exchange lowered to collectives; the
inner iteration has a fused Pallas kernel.

Layer map (mirrors SURVEY.md section 7):
    config      flag-compatible configuration (`Config`, `args_parser`)
    ops/        problem + topology kernels: sensing matrices, synthetic data, batched
                graphs/Laplacians/coloring, GCN primitives, native C++ graph builder
    models/     solver cores: Jacobi unfolded scan (`dadmm_core`), scalar-table model
                (`unfolded`), GNN hypernetwork (`gnn_hypernet`), classic Gauss-Seidel
                color-sweep solvers (`classic`), learned tables (`seq_hyperparam`)
    parallel/   mesh construction, collective consensus (all_gather / ppermute ring),
                shard_map solver, GSPMD train steps
    kernels/    Pallas fused iteration
    train/      losses/metrics, optax optimizers with host-driven LR, schedules
                (progressive-K, plateau, early stop), full training loops, classic
                sequential-segment loop
    utils/      run logging (CSV/JSON), checkpoint/resume, profiling, backend select
    cli/        drivers: dlasso, dlr, unfolded_train, unfolded_train_new,
                gnn_progressive, compare
"""

from .config import Config, args_parser

__version__ = "0.1.0"
__all__ = ["Config", "args_parser", "__version__"]
