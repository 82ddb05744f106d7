"""Import reference-framework (PyTorch) trained runs into this framework's format.

Two reference checkpoint families are covered: the unfolded-table runs (below) and
the progressive-GNN flagship runs (`load_reference_progressive_run` /
`import_progressive_run` — see the section comment further down), with
`detect_run_family` dispatching `dadmm-import` between them.

The reference saves unfolded-table runs as `{model.pt, A.pt, args.pt}` under a run
directory (`unfolded_train_new.py:146-184`): `model.pt` is an `nn.Module` state dict
whose single entry `seq_hyp.param` is the raw cumsum-sigmoid table `[K, Pp, 4]`
(`unfolded_DLASSO.py:148-152`), `A.pt` the sensing matrices `[1, P, m, n]`
(`gnn_dlasso_utils.py:4-16`), and `args.pt` the pickled argparse namespace. A user
migrating from the reference can convert such a run with

    dadmm-import <reference_run_dir> <out_dir> [--recover_graph]

after which `cli.evaluate` serves it exactly like a natively trained run. Because the
parameterization here is bit-matched to the reference (`models/seq_hyperparam.py`),
the imported weights reproduce the reference model's behavior — this is also how the
golden-weights parity tests pin cross-framework numerics
(`tests/test_golden_reference.py`).

One thing the reference does NOT save is the fixed training topology: the driver draws
an unseeded `nx.erdos_renyi_graph(P, prob)` once per run (`unfolded_train_new.py:56`)
and the learned per-agent table is specific to that Laplacian. `recover_training_graph`
reconstructs it by enumerating (P small) or sampling candidate topologies and picking
the one the imported table solves best — the recovered adjacency is stored as
`graph.npy` in the run dir and honored by `cli.evaluate`.
"""

from __future__ import annotations

import itertools
import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import Config


def load_reference_unfolded_run(src_dir: str) -> Tuple[np.ndarray, np.ndarray, Config]:
    """Read `{model.pt, A.pt, args.pt}` → (A [P,m,n], raw table [K,Pp,4], Config).

    torch is used only here, for deserialization; everything downstream is numpy/JAX.
    """
    import torch

    state = torch.load(os.path.join(src_dir, "model.pt"), map_location="cpu",
                       weights_only=False)
    if hasattr(state, "state_dict"):  # whole-module save, not a state dict
        state = state.state_dict()
    if "seq_hyp.param" not in state:
        raise ValueError(
            f"{src_dir}/model.pt has keys {list(state.keys())} — not an unfolded-table "
            "run (expected 'seq_hyp.param'; progressive-GNN checkpoints live in "
            "best_model.pt/final_model.pt — use import_progressive_run)")
    raw = state["seq_hyp.param"].detach().numpy().astype(np.float32)

    A = torch.load(os.path.join(src_dir, "A.pt"), map_location="cpu",
                   weights_only=False)
    A = A.detach().numpy().astype(np.float32)
    if A.ndim == 4:  # reference keeps a leading broadcast axis `[1,P,m,n]`
        A = A[0]

    ns = torch.load(os.path.join(src_dir, "args.pt"), map_location="cpu",
                    weights_only=False)
    d = dict(vars(ns)) if not isinstance(ns, dict) else dict(ns)
    known = {f.name for f in Config.__dataclass_fields__.values()}
    cfg = Config(**{k: v for k, v in d.items() if k in known})
    # The table defines K; trust it over the namespace (layer-wise runs save prefixes).
    cfg = cfg.replace(GHN_iter_num=int(raw.shape[0]), hyp_mode="unfolded",
                      case="dlasso", resume="")
    if raw.shape[1] not in (1, cfg.P):
        raise ValueError(f"table agent axis {raw.shape[1]} matches neither 1 nor P={cfg.P}")
    cfg = cfg.replace(DADMM_mode="same" if raw.shape[1] == 1 else "diff")
    return A, raw, cfg


# ---------------------------------------------------------------------------
# Progressive-GNN family (the reference flagship, `gnn_dlasso_progressive.py`)
# ---------------------------------------------------------------------------
#
# The flagship driver saves rich checkpoints `{epoch, model_state_dict,
# optimizer_state_dict, valid_loss, args, current_iterations}` as
# `best_model.pt` / `final_model.pt` (`gnn_dlasso_progressive.py:288-295,315-322`)
# plus `args.pt` and `A.pt` alongside. `model_state_dict` holds the
# `DLASSO_GNNHyp3_Progressive` weights (`gnn_dlasso_models_progressive.py:75-129`):
# 5 GCNConv layers (PyG stores each as `conv{i}.lin.weight` [out,in] + `conv{i}.bias`)
# with BatchNorm1d (`bn{i}.{weight,bias,running_mean,running_var}`), a final
# LayerNorm `norm`, the 3-Linear/3-LayerNorm `decoder` Sequential (param indices
# 0/4/8 Linear, 2/6/10 LayerNorm), and the `fc` head. The mapping below transposes
# every Linear/GCN weight ([out,in] -> [in,out]; this framework right-multiplies)
# and regroups into the `models/gnn_hypernet.DLASSOGNNHyp` pytree —
# `{"encoder": {"convs", "bn", "ln"}, "decoder": {"layers", "fc"}}` + norm_state
# `{"bn": [{"mean","var"}]}`. The reference snapshot's own trained GNN weights are
# git-LFS-missing, so correctness is pinned by a synthetic round-trip instead:
# export our pytree to the torch naming (`progressive_params_to_torch_state`),
# re-import, and require bit equality (tests/test_golden_reference.py).

_DEC_PAIRS = ((0, 2), (4, 6), (8, 10))  # decoder Sequential: (Linear, LayerNorm) idx


def map_progressive_state(sd, P: int, hidden: int, mode: str):
    """torch `model_state_dict` -> (params pytree, norm_state) for DLASSOGNNHyp."""
    def g(k):
        t = sd[k]
        arr = t.detach().numpy() if hasattr(t, "detach") else np.asarray(t)
        return np.ascontiguousarray(arr.astype(np.float32))

    convs, bn_p, bn_s = [], [], []
    for i in range(1, 6):
        w = g(f"encoder.conv{i}.lin.weight").T
        if f"encoder.conv{i}.bias" in sd:
            b = g(f"encoder.conv{i}.bias")
        elif f"encoder.conv{i}.lin.bias" in sd:  # older PyG: bias inside lin
            b = g(f"encoder.conv{i}.lin.bias")
        else:
            b = np.zeros((w.shape[1],), np.float32)
        convs.append({"w": w, "b": b})
        bn_p.append({"scale": g(f"encoder.bn{i}.weight"),
                     "bias": g(f"encoder.bn{i}.bias")})
        bn_s.append({"mean": g(f"encoder.bn{i}.running_mean"),
                     "var": g(f"encoder.bn{i}.running_var")})
    enc = {"convs": convs, "bn": bn_p,
           "ln": {"scale": g("encoder.norm.weight"), "bias": g("encoder.norm.bias")}}
    layers = []
    for lin, lnorm in _DEC_PAIRS:
        layers.append({
            "w": g(f"decoder.{lin}.weight").T, "b": g(f"decoder.{lin}.bias"),
            "ln_scale": g(f"decoder.{lnorm}.weight"),
            "ln_bias": g(f"decoder.{lnorm}.bias"),
        })
    fc = {"w": g("fc.weight").T, "b": g("fc.bias")}
    out_dim = 4 if mode == "same" else 4 * P
    if fc["w"].shape != (hidden, out_dim):
        raise ValueError(
            f"fc head shape {fc['w'].shape} does not match DADMM_mode={mode!r} "
            f"P={P} hidden={hidden} (expected {(hidden, out_dim)})")
    if layers[0]["w"].shape[0] != P * 4 * hidden:
        raise ValueError(
            f"decoder input dim {layers[0]['w'].shape[0]} != P*4*hidden = "
            f"{P * 4 * hidden} — wrong P or GHyp_hidden for this checkpoint")
    return {"encoder": enc, "decoder": {"layers": layers, "fc": fc}}, {"bn": bn_s}


def progressive_params_to_torch_state(params: dict, norm_state: dict) -> dict:
    """Our DLASSOGNNHyp pytree -> reference torch state-dict naming (the export
    direction; also the fixture generator for the round-trip import test)."""
    import torch

    t = lambda x: torch.tensor(np.ascontiguousarray(np.asarray(x, np.float32)))
    sd = {}
    for i, (conv, bnp, bns) in enumerate(zip(
            params["encoder"]["convs"], params["encoder"]["bn"],
            norm_state["bn"]), start=1):
        sd[f"encoder.conv{i}.lin.weight"] = t(np.asarray(conv["w"]).T)
        sd[f"encoder.conv{i}.bias"] = t(conv["b"])
        sd[f"encoder.bn{i}.weight"] = t(bnp["scale"])
        sd[f"encoder.bn{i}.bias"] = t(bnp["bias"])
        sd[f"encoder.bn{i}.running_mean"] = t(bns["mean"])
        sd[f"encoder.bn{i}.running_var"] = t(bns["var"])
        sd[f"encoder.bn{i}.num_batches_tracked"] = torch.tensor(0)
    sd["encoder.norm.weight"] = t(params["encoder"]["ln"]["scale"])
    sd["encoder.norm.bias"] = t(params["encoder"]["ln"]["bias"])
    for (lin, lnorm), lyr in zip(_DEC_PAIRS, params["decoder"]["layers"]):
        sd[f"decoder.{lin}.weight"] = t(np.asarray(lyr["w"]).T)
        sd[f"decoder.{lin}.bias"] = t(lyr["b"])
        sd[f"decoder.{lnorm}.weight"] = t(lyr["ln_scale"])
        sd[f"decoder.{lnorm}.bias"] = t(lyr["ln_bias"])
    sd["fc.weight"] = t(np.asarray(params["decoder"]["fc"]["w"]).T)
    sd["fc.bias"] = t(params["decoder"]["fc"]["b"])
    return sd


def load_reference_progressive_run(src_dir: str, ckpt_file: Optional[str] = None):
    """Read a flagship progressive run dir -> (A [P,m,n], params, norm_state,
    Config, meta). Prefers `best_model.pt` (the early-stopping winner) over
    `final_model.pt`; `ckpt_file` overrides."""
    import torch

    if ckpt_file is None:
        for cand in ("best_model.pt", "final_model.pt"):
            if os.path.exists(os.path.join(src_dir, cand)):
                ckpt_file = cand
                break
        else:
            raise FileNotFoundError(
                f"{src_dir} has neither best_model.pt nor final_model.pt")
    blob = torch.load(os.path.join(src_dir, ckpt_file), map_location="cpu",
                      weights_only=False)
    if not isinstance(blob, dict) or "model_state_dict" not in blob:
        raise ValueError(f"{src_dir}/{ckpt_file} is not a progressive checkpoint "
                         "(expected a dict with 'model_state_dict')")
    sd = blob["model_state_dict"]

    ns = blob.get("args")
    if ns is None:  # fall back to the sibling args.pt
        ns = torch.load(os.path.join(src_dir, "args.pt"), map_location="cpu",
                        weights_only=False)
    d = dict(vars(ns)) if not isinstance(ns, dict) else dict(ns)
    known = {f.name for f in Config.__dataclass_fields__.values()}
    cfg = Config(**{k: v for k, v in d.items() if k in known})
    # The flagship trains on FRESH per-batch topologies
    # (`gnn_dlasso_progressive.py:181-191`) — record that regime so evaluate/serve
    # sample fresh connected graphs rather than reconstructing a fixed one.
    cfg = cfg.replace(hyp_mode="GHyp", case="dlasso", encoder_type="gcn",
                      decoder_type="flattened", graph_mode="fresh", resume="")

    a_path = os.path.join(src_dir, "A.pt")
    if os.path.exists(a_path):
        A = torch.load(a_path, map_location="cpu", weights_only=False)
        A = A.detach().numpy().astype(np.float32)
        if A.ndim == 4:
            A = A[0]
    else:
        raise FileNotFoundError(
            f"{src_dir}/A.pt missing — the sensing matrices are part of the "
            "model (per-agent A^T A operators) and cannot be regenerated")
    P, _, n = A.shape
    if P != cfg.P or n != cfg.n:
        raise ValueError(f"A.pt shape {A.shape} disagrees with args (P={cfg.P}, n={cfg.n})")
    params, norm_state = map_progressive_state(
        sd, cfg.P, int(cfg.GHyp_hidden), cfg.DADMM_mode)
    meta = {"imported_from": os.path.abspath(os.path.join(src_dir, ckpt_file)),
            "epoch": blob.get("epoch", "imported")}
    for k_src, k_dst in (("valid_loss", "valid_loss"),
                         ("final_valid_loss", "valid_loss"),
                         ("current_iterations", "current_iterations"),
                         ("final_iterations", "current_iterations")):
        if k_src in blob:
            try:
                meta[k_dst] = float(blob[k_src])
            except (TypeError, ValueError):
                pass
    return A, params, norm_state, cfg, meta


def import_progressive_run(src_dir: str, out_dir: str,
                           ckpt_file: Optional[str] = None) -> Dict:
    """Convert a reference progressive-GNN run dir into this framework's layout
    (`args.json` + `A.npy` + `best/` with {"params", "norm_state"}), servable by
    `cli.evaluate` / `cli.serve` and resumable by `cli.gnn_progressive`."""
    from . import checkpoint as ckpt

    A, params, norm_state, cfg, meta = load_reference_progressive_run(
        src_dir, ckpt_file)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "A.npy"), A)
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        f.write(cfg.to_json())
    ckpt.save(os.path.join(out_dir, "best"),
              {"params": params, "norm_state": norm_state}, meta)
    return {"out_dir": out_dir, "family": "progressive", "K": int(cfg.GHN_iter_num),
            "P": cfg.P, "mode": cfg.DADMM_mode,
            **{k: v for k, v in meta.items() if k != "imported_from"}}


def _reference_namespace(cfg: Config):
    """Config -> argparse.Namespace with the reference's flag names (the full
    field set — reference scripts read attributes ad hoc)."""
    import argparse

    return argparse.Namespace(**dict(cfg.__dict__))


def export_unfolded_run(run_dir: str, out_dir: str,
                        ckpt_name: str = "best") -> Dict:
    """Reverse migration: a natively trained unfolded-table run -> the reference
    torch layout `{model.pt, A.pt, args.pt}` (`unfolded_train_new.py:146-184`),
    loadable by the reference's own `DLASSO_unfolded` + `seq_hyperparam` classes
    (the raw cumsum table is the state dict's single `seq_hyp.param` entry)."""
    import torch

    from . import checkpoint as ckpt

    with open(os.path.join(run_dir, "args.json")) as f:
        cfg = Config.from_json(f.read())
    A = np.load(os.path.join(run_dir, "A.npy"))
    tree, _ = ckpt.restore_partial(
        os.path.join(run_dir, ckpt_name),
        {"params": {"seq_hyp": np.zeros((cfg.GHN_iter_num,
                                         1 if cfg.DADMM_mode == "same" else cfg.P,
                                         4), np.float32)}})
    raw = np.asarray(tree["params"]["seq_hyp"], np.float32)
    os.makedirs(out_dir, exist_ok=True)
    torch.save({"seq_hyp.param": torch.tensor(raw)},
               os.path.join(out_dir, "model.pt"))
    torch.save(torch.tensor(np.asarray(A, np.float32)[None]),
               os.path.join(out_dir, "A.pt"))
    torch.save(_reference_namespace(cfg), os.path.join(out_dir, "args.pt"))
    return {"out_dir": out_dir, "family": "unfolded", "K": int(raw.shape[0]),
            "P": cfg.P, "mode": cfg.DADMM_mode}


def export_progressive_run(run_dir: str, out_dir: str,
                           ckpt_name: str = "best") -> Dict:
    """Reverse migration: a natively trained flagship run -> the reference's
    rich-checkpoint layout (`best_model.pt` dict per
    `gnn_dlasso_progressive.py:288-295` + `A.pt` + `args.pt`). Only the
    reference architecture exports (encoder_type='gcn',
    decoder_type='flattened', hyp_mode='GHyp'); the TPU-only heads (nodewise,
    mpnn/attention, one-shot tiers) have no reference-side class to load into."""
    import jax
    import torch

    from ..models.gnn_hypernet import DLASSOGNNHyp
    from . import checkpoint as ckpt

    with open(os.path.join(run_dir, "args.json")) as f:
        cfg = Config.from_json(f.read())
    if (cfg.hyp_mode != "GHyp" or cfg.encoder_type != "gcn"
            or cfg.decoder_type != "flattened"):
        raise ValueError(
            f"only the reference architecture exports (hyp_mode=GHyp, "
            f"encoder_type=gcn, decoder_type=flattened); this run is "
            f"hyp_mode={cfg.hyp_mode!r} encoder={cfg.encoder_type!r} "
            f"decoder={cfg.decoder_type!r} — beyond-reference tiers have no "
            "reference-side class to load into")
    import jax.numpy as jnp

    A = jnp.asarray(np.load(os.path.join(run_dir, "A.npy")))
    model = DLASSOGNNHyp(A, cfg)
    p_init, s_init = model.init(jax.random.key(0))
    tree, meta = ckpt.restore_partial(
        os.path.join(run_dir, ckpt_name),
        {"params": p_init, "norm_state": s_init})
    sd = progressive_params_to_torch_state(tree["params"], tree["norm_state"])
    meta = meta or {}
    os.makedirs(out_dir, exist_ok=True)
    ns = _reference_namespace(cfg)
    torch.save({
        "epoch": meta.get("epoch", 0),
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "valid_loss": meta.get("valid_loss", float("nan")),
        "args": ns,
        "current_iterations": meta.get("current_iterations", cfg.GHN_iter_num),
    }, os.path.join(out_dir, "best_model.pt"))
    torch.save(torch.tensor(np.asarray(A, np.float32)[None]),
               os.path.join(out_dir, "A.pt"))
    torch.save(ns, os.path.join(out_dir, "args.pt"))
    return {"out_dir": out_dir, "family": "progressive",
            "K": int(cfg.GHN_iter_num), "P": cfg.P, "mode": cfg.DADMM_mode,
            "epoch": meta.get("epoch", 0)}


def detect_run_family(src_dir: str) -> str:
    """'progressive' (rich best/final_model.pt checkpoints) vs 'unfolded'
    ({model.pt with seq_hyp.param}). Dispatch for `dadmm-import`."""
    for cand in ("best_model.pt", "final_model.pt"):
        if os.path.exists(os.path.join(src_dir, cand)):
            return "progressive"
    if os.path.exists(os.path.join(src_dir, "model.pt")):
        return "unfolded"
    raise FileNotFoundError(
        f"{src_dir} contains neither a progressive checkpoint "
        "(best_model.pt/final_model.pt) nor an unfolded run (model.pt)")


def _connected(adj: np.ndarray) -> bool:
    P = adj.shape[0]
    reach = np.eye(P, dtype=bool) | adj.astype(bool)
    for _ in range(P - 1):
        reach = reach | (reach @ reach)
    return bool(reach.all())


def candidate_graphs(P: int, prob: float, max_candidates: int = 1024,
                     seed: int = 0) -> np.ndarray:
    """Connected candidate adjacencies `[G, P, P]`.

    Small edge spaces (P <= 5 at the default budget): ALL connected labeled graphs
    (e.g. 728 of the 1024 5-node graphs), so the true training topology is guaranteed
    to be among the candidates. Larger P: ER-sampled at the run's edge probability
    (the training distribution), deduplicated.
    """
    pairs = list(itertools.combinations(range(P), 2))
    n_edges = len(pairs)
    out, seen = [], set()
    if n_edges < 63 and 2 ** n_edges <= max_candidates:
        for mask in range(1, 2 ** n_edges):
            adj = np.zeros((P, P), np.float32)
            for e, (i, j) in enumerate(pairs):
                if (mask >> e) & 1:
                    adj[i, j] = adj[j, i] = 1.0
            if _connected(adj):
                out.append(adj)
    else:
        rng = np.random.default_rng(seed)
        for _ in range(max_candidates):
            bits = rng.random(n_edges) < prob
            key = bits.tobytes()
            if key in seen:
                continue
            seen.add(key)
            adj = np.zeros((P, P), np.float32)
            for e, (i, j) in enumerate(pairs):
                if bits[e]:
                    adj[i, j] = adj[j, i] = 1.0
            if _connected(adj):
                out.append(adj)
    return np.stack(out)


def recover_training_graph(
    A, raw: np.ndarray, cfg: Config, num_samples: int = 32,
    max_candidates: int = 1024, data_seed: int = 99,
) -> Tuple[np.ndarray, np.ndarray]:
    """Find the fixed topology an imported per-agent table was trained against.

    Evaluates the table's final-layer loss on the candidate graphs batched into the
    batch axis (topology is data here, so one compiled program scores a whole block
    of candidates; blocks of 64 bound host memory — Y is [K, G_blk*S, P, n]) and
    returns (best adjacency [P,P], per-candidate losses [G]). Scoring runs with
    training=False so the selected graph is optimal for the exact table that
    `cli.evaluate`/`cli.serve` execute.
    """
    import jax
    import jax.numpy as jnp

    from ..models.unfolded import UnfoldedDLASSO
    from ..ops import data as data_ops

    cands = candidate_graphs(cfg.P, cfg.graph_prob, max_candidates)
    A = jnp.asarray(A)
    model = UnfoldedDLASSO(A, cfg)
    key = jax.random.key(data_seed)
    k_data, k_state = jax.random.split(key)
    b, y = data_ops.make_dataset(k_data, A, num_samples, cfg.snr, noise=cfg.data_noise)

    G_BLK = 64
    apply = jax.jit(lambda p, k, b_, a_: model.apply(p, k, b_, a_, training=False)[0])
    params = {"seq_hyp": jnp.asarray(raw)}
    scores = []
    for lo in range(0, cands.shape[0], G_BLK):
        blk = cands[lo:lo + G_BLK]
        g = blk.shape[0]
        if g < G_BLK and lo:  # pad the tail block to the compiled candidate count
            blk = np.concatenate([blk, np.repeat(blk[-1:], G_BLK - g, axis=0)])
        b_t = jnp.tile(b, (blk.shape[0], 1, 1))
        adj_t = jnp.repeat(jnp.asarray(blk), num_samples, axis=0)
        Y = apply(params, k_state, b_t, adj_t)
        yK = Y[-1].reshape(blk.shape[0], num_samples, cfg.P, cfg.n)
        diff = yK - jnp.asarray(y)[None, :, None, :]
        scores.append(np.asarray(jnp.mean(diff * diff, axis=(1, 2, 3)))[:g])
    per_graph = np.concatenate(scores)
    best = int(np.argmin(per_graph))
    return cands[best], per_graph


def import_unfolded_run(
    src_dir: str, out_dir: str, recover_graph: bool = False,
    graph_candidates: int = 1024, graph_samples: int = 32,
    graph_mode: str = "fixed",
) -> Dict:
    """Convert a reference unfolded run dir into this framework's run-dir layout
    (`args.json` + `A.npy` + `best/` checkpoint [+ `graph.npy`]), servable by
    `cli.evaluate` and resumable as initialization by the training drivers.

    graph_mode records the run's topology regime in args.json (the reference never
    saves it): 'fixed' for single-graph runs like csv_folder1 (pair with
    recover_graph), 'fresh' for fresh-graphs-per-batch runs like csv_folder2 —
    evaluate/serve then sample fresh connected topologies instead of reconstructing
    a fixed one."""
    from . import checkpoint as ckpt

    A, raw, cfg = load_reference_unfolded_run(src_dir)
    cfg = cfg.replace(graph_mode=graph_mode)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "A.npy"), A)
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        f.write(cfg.to_json())
    meta = {"imported_from": os.path.abspath(src_dir), "epoch": "imported"}
    info: Dict = {"out_dir": out_dir, "K": int(raw.shape[0]), "P": cfg.P,
                  "mode": cfg.DADMM_mode}
    if recover_graph:
        adj, per_graph = recover_training_graph(
            A, raw, cfg, num_samples=graph_samples, max_candidates=graph_candidates)
        np.save(os.path.join(out_dir, "graph.npy"), adj)
        meta["recovered_graph_loss"] = float(per_graph.min())
        meta["graph_candidates"] = int(per_graph.shape[0])
        info["graph_loss_best"] = float(per_graph.min())
        info["graph_loss_median"] = float(np.median(per_graph))
        info["graph_candidates"] = int(per_graph.shape[0])
    ckpt.save(os.path.join(out_dir, "best"), {"params": {"seq_hyp": raw}}, meta)
    return info
