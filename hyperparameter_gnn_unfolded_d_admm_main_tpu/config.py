"""Configuration for the TPU-native unfolded D-ADMM framework.

Flag names and defaults mirror the reference CLI (`configurations.py:3-131` in the
reference repo) so that experiment configs are directly comparable, plus a handful of
TPU-specific knobs (dtype, mesh shape, remat, pallas) that have no reference analogue.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Config:
    # --- problem sizes (reference configurations.py:6-17) ---
    m: int = 100                       # rows per agent sensing matrix
    n: int = 500                       # signal dimension
    alpha_max: float = 0.1             # max step size
    tau_max: float = 0.99              # max l1 weight
    rho_max: float = 0.99              # max consensus weight
    eta_max: float = 0.99              # max dual step

    # --- hyperparameter init fractions (reference configurations.py:20-31) ---
    init_alpha_frac: float = 0.2
    init_tau_frac: float = 0.15
    init_rho_frac: float = 0.25
    init_eta_frac: float = 0.1
    max_penalty_threshold: float = 0.8
    penalty_reduction_factor: float = 0.95

    # --- experiment bookkeeping (reference configurations.py:33-41) ---
    exp_name: str = "exp for 5 agents"
    eval: bool = False
    method: str = "u-dadmm"            # {'dadmm', 'u-dadmm'}
    seq_num: int = 0

    # --- data (reference configurations.py:44-58) ---
    data: str = "simulated"            # {'mnist', 'simulated'}
    norm_mean: float = 0.5
    norm_std: float = 0.5
    train_size: int = 200
    snr: int = 4                       # {-2, 0, 2, 4}
    test_size: int = 32
    batch_size: int = 16

    # --- graph (reference configurations.py:61-65) ---
    P: int = 5                         # number of agents
    graph_prob: float = 0.5            # ER edge probability
    graph_type: str = "erods_renyi"
    graph_mode: str = "fixed"          # unfolded-table driver: {'fixed', 'fresh'} —
                                       # 'fixed' = one graph for every batch
                                       # (reference unfolded_train_new.py:56); 'fresh'
                                       # = new connected per-sample graphs each step
                                       # (the reference csv_folder2 baseline regime)

    # --- D-ADMM (reference configurations.py:67-92) ---
    case: str = "dlasso"               # {'dlasso', 'dlr'}
    model: str = "same"                # {'diff', 'same'} (classic solvers)
    rho: float = 0.2603
    alpha: float = 0.3013
    eta: float = 0.0867
    gamma: float = 1.1797e-07
    beta: float = 1.2260e-03
    delta: float = 1.2665e-04
    tau: float = 0.1142
    sequential: bool = False
    max_iter_seg: int = 2
    max_iter: int = 25
    num_epochs: int = 10

    # --- learning (reference configurations.py:98-114) ---
    optimizer: str = "adam"            # {'sgd', 'adam'}
    lr: float = 1e-4
    momentum: float = 0.5e-5
    weight_decay: float = 1e-4
    lr_scheduler: bool = False
    device: str = "tpu"                # informational; JAX picks the backend
    valid: bool = True
    seed: int = 42

    # --- GNN hypernetwork (reference configurations.py:118-128) ---
    GHyp_hidden: int = 100
    DADMM_mode: str = "diff"           # {'same', 'diff'}
    hyp_mode: str = "unfolded"         # {'GHyp', 'unfolded'} + 'GHyp1'/'GHyp1c' (one-shot tiers)
    GHN_iter_num: int = 15             # K, unfolded iterations
    save_dir: str = "./results"
    resume: str = ""                   # checkpoint dir (a run's best/ or last/) to
                                       # resume training from — restores model,
                                       # optimizer, scheduler and early-stop state
                                       # (no reference analogue: it only saves)

    # --- TPU-native knobs (no reference analogue) ---
    dtype: str = "float32"             # solver-state dtype ('bfloat16' halves the
                                       # per-iteration HBM state traffic; trajectory
                                       # diverges from f32 — inference/serving knob)
    matmul_dtype: str = "float32"      # dtype fed to the MXU ('bfloat16' to go faster)
    data_noise: bool = False           # reference gnn_data.py:12-14 overwrites the noise
                                       # term, making data noiseless regardless of --snr;
                                       # False reproduces that, True applies real noise
    gram_mode: str = "gram"            # A^T A y operator: 'gram' = precomputed
                                       # [P,n,n] stream (reference form, parity
                                       # default), 'factored' = A^T(A y) (2m/n of
                                       # the FLOPs + m/n of the HBM weight traffic),
                                       # 'auto' = factored when 2m < n
    nan_guard: bool = True             # replicate NaN/Inf reset ladders
    remat: bool = True                 # jax.checkpoint the per-iteration scan body
    use_pallas: bool = False           # fused Pallas inner iteration
    mesh_data: int = 1                 # data-parallel mesh axis size
    mesh_agents: int = 1               # agent-parallel mesh axis size
    min_iterations: int = 1            # progressive schedule floor (reference
                                       # gnn_dlasso_progressive.py:73)
    profile: bool = False              # capture a jax.profiler trace of the first
                                       # post-compile training epoch into <run>/trace
    tensorboard: bool = False          # also emit TensorBoard scalars (<run>/tb)
    native_prefetch: bool = True       # overlap per-batch topology sampling with
                                       # device execution via the C++ pipeline
                                       # (native/pipeline.cc); bitwise-identical
                                       # topologies to the synchronous native path,
                                       # silently off when the .so is not built
    encoder_type: str = "gcn"          # hypernetwork encoder: {'gcn', 'mpnn',
                                       # 'attention'} — gcn is the reference's live
                                       # design; mpnn/attention cover its archived
                                       # design space (old code/gnn_dlasso_models4.py)
    compile_cache: str = ""            # persistent XLA compilation-cache dir (restarts
                                       # and resumes reuse compiled executables; the
                                       # progressive trainer alone compiles one program
                                       # per distinct K)
    masked_k: bool = False             # progressive trainer: ONE compiled max-K scan
                                       # with iterations >= K(epoch) masked (frozen
                                       # state, zero grad) instead of one compiled
                                       # program per distinct K — trades wasted
                                       # masked-iteration FLOPs (negligible at small P)
                                       # for zero per-K recompiles
    stop_after_epoch: int = 0          # pause training after this many epochs (the
                                       # 'last' checkpoint is written, then the loop
                                       # returns) while schedules keep the FULL
                                       # num_epochs horizon — resume with
                                       # `--resume <run>/last`. Checkpoints carry the
                                       # PRNG key / data-shuffle / graph-seed streams,
                                       # so pause+resume reproduces the uninterrupted
                                       # run exactly (tests/test_sharded_training_
                                       # e2e.py). 0 = off.
    warmup_epochs: int = 0             # linear LR warmup over the first N epochs
                                       # (0 = off, reference-faithful); stabilizes the
                                       # attention encoder's seed sensitivity
                                       # (train/schedule.py:warmup_factor)
    graph_prob_floor: float = 0.3      # fresh-graph samplers clamp edge prob to
                                       # >= this (reference gnn_dlasso_progressive
                                       # .py:183 hard-codes 0.3 — sane at P=5,
                                       # pathological at P=1024 where it yields
                                       # degree ~300 and saturates the gradient
                                       # clamps; set ~12/P at pod scale)
    data_path: str = ""                # load the train/test pool from a saved npz
                                       # (ops/datastore.py; make one with
                                       # `python -m ...cli.data_tool make`) using the
                                       # reference's head/tail slicing + 1200-sample
                                       # truncation (LoadData.py:16-24); the dlr
                                       # drivers treat it as a local-MNIST directory.
                                       # Empty = seeded on-device regeneration.
    lr_feature_dim: int = 784          # classic-dlr per-sample feature width
                                       # (reference dlr.py trains on flattened
                                       # 28x28 MNIST; train/classic_loop.py and
                                       # cli/serve.py derive the solver shape from
                                       # this instead of hard-coding 784, so
                                       # tables trained at other widths serve
                                       # with the right shape via args.json)
    decoder_type: str = "flattened"    # flagship hypernetwork head: 'flattened' =
                                       # reference-faithful P*4h->MLP (params O(P),
                                       # gnn_dlasso_models_progressive.py:93-106);
                                       # 'nodewise' = shared per-agent MLP head whose
                                       # parameter count is independent of P — the
                                       # pod-scale head ('same' mode pools embeddings)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _add_bool_flag(parser: argparse.ArgumentParser, name: str, default: bool, help_: str = ""):
    parser.add_argument(f"--{name}", dest=name, action="store_true", default=default, help=help_)
    parser.add_argument(f"--no-{name}", dest=name, action="store_false")


def args_parser(argv: Optional[list] = None) -> Config:
    """Argparse front-end mirroring reference `configurations.py:args_parser`.

    Every reference flag keeps its name and default; booleans gain a `--no-` variant.
    Returns a `Config` dataclass rather than a raw namespace.
    """
    defaults = Config()
    parser = argparse.ArgumentParser(description="TPU-native unfolded D-ADMM")
    for f in dataclasses.fields(Config):
        default = getattr(defaults, f.name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            _add_bool_flag(parser, f.name, default)
        elif isinstance(default, int):
            parser.add_argument(f"--{f.name}", type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(f"--{f.name}", type=float, default=default)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=default)
    ns = parser.parse_args(argv)
    return Config(**vars(ns))
