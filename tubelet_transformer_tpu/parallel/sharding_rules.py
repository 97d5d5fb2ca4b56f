"""Parameter sharding rules for the ('data', 'model') mesh.

Data parallelism is the reference's only strategy (SURVEY §2.8); the 'model'
axis adds Megatron-style tensor parallelism for the transformer as a new
TPU-native capability:

  * column-parallel: qkv packed projections (``in_proj``) and FFN ``linear1``
    kernels shard their *output* features over 'model';
  * row-parallel: ``out_proj`` / ``linear2`` kernels shard their *input*
    features over 'model' (XLA inserts the psum over ICI automatically when
    jit propagates these shardings — no hand-written collectives);
  * everything else (norms, biases, convs, heads) replicates.

Biases of column-parallel layers are left replicated: XLA resolves the
mismatch with cheap reshards; correctness is unaffected.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_KEYS = ("in_proj", "linear1")
_ROW_KEYS = ("out_proj", "linear2")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for params under the given mesh."""
    n_model = mesh.shape.get("model", 1)

    n_pipe = mesh.shape.get("pipe", 1)

    def rule(path, x):
        p = _path_str(path)
        # Pipeline parallelism: the pipelined encoder's stacked layer params
        # ('encoder_stack', leading axis = layer) shard over 'pipe' so each
        # stage's slice lives only on its stage's devices. Checked first —
        # stacked leaves also contain TP-pattern names like in_proj.
        if n_pipe > 1 and "encoder_stack" in p and hasattr(x, "ndim") \
                and x.ndim >= 1 and x.shape[0] % n_pipe == 0:
            return NamedSharding(mesh, P("pipe", *([None] * (x.ndim - 1))))
        # Expert parallelism: MoE expert stacks (models/moe.py — expert_w1
        # (E,D,F), expert_b1 (E,F), ...) shard the expert axis over 'model';
        # GSPMD keeps per-expert compute local and inserts all-gather /
        # all-reduce for dispatch/combine (verified in compiled HLO).
        # The router stays replicated (every chip routes its own tokens).
        if n_model > 1 and hasattr(x, "ndim") and x.ndim >= 2 \
                and "expert_" in p and x.shape[0] % n_model == 0:
            return NamedSharding(mesh, P("model", *([None] * (x.ndim - 1))))
        if n_model > 1 and hasattr(x, "ndim") and x.ndim == 2:
            last = p.rsplit("/", 2)
            name = "/".join(last[-2:])
            if any(k in name for k in _COL_KEYS) and "bias" not in name \
                    and x.shape[1] % n_model == 0:
                return NamedSharding(mesh, P(None, "model"))
            if any(k in name for k in _ROW_KEYS) and "bias" not in name \
                    and x.shape[0] % n_model == 0:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(state, mesh: Mesh, zero1: bool = False):
    """NamedSharding pytree mirroring a TrainState: params/opt_state per the
    TP rules (optimizer moments mirror the param layout), batch_stats and
    step replicated.

    With ``zero1`` (ZeRO stage 1, the last SURVEY §2.8 strategy-table row),
    Adam moments of *replicated* params additionally shard their leading
    axis over 'data' where divisible: each data shard owns 1/n_data of
    mu/nu and updates it locally (grads arrive replicated after the data
    all-reduce, so the moment update needs no collective); only the param
    delta is gathered back to replicated — the classic ZeRO-1 all-gather,
    emitted by GSPMD when the output params are pinned replicated
    (engine.make_train_step's out_shardings). TP-sharded params keep their
    moments in the param layout (already distributed over 'model')."""
    p_shard = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())
    n_data = mesh.shape.get("data", 1)

    # Optimizer state: Adam mu/nu embed copies of the params pytree, so a
    # moment leaf's path ends with its param's path — match on that (plus
    # shape) rather than on shape alone, which mis-places moments when two
    # same-shaped params shard differently (e.g. a replicated (256,256)
    # MLP kernel vs a row-sharded (256,256) out_proj kernel).
    shard_by_path = {}
    for path, sh in jax.tree_util.tree_flatten_with_path(p_shard)[0]:
        shard_by_path["/" + _path_str(path)] = sh
    shape_by_path = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        shape_by_path["/" + _path_str(path)] = getattr(leaf, "shape", ())

    def opt_rule(path, x):
        ps = "/" + _path_str(path)
        for param_path, sh in shard_by_path.items():
            if ps.endswith(param_path) \
                    and getattr(x, "shape", ()) == shape_by_path[param_path]:
                shape = shape_by_path[param_path]
                if zero1 and n_data > 1 and sh.spec == P() and shape:
                    # shard the largest divisible axis (conv kernels lead
                    # with size-1/3 spatial dims; their channel axes are
                    # the ones that divide)
                    axes = sorted(range(len(shape)), key=lambda i: -shape[i])
                    for i in axes:
                        if shape[i] % n_data == 0:
                            spec = [None] * len(shape)
                            spec[i] = "data"
                            return NamedSharding(mesh, P(*spec))
                return sh
        return repl

    return state.replace(
        step=repl,
        params=p_shard,
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(opt_rule, state.opt_state),
    )


def shard_train_state(state, mesh: Mesh, zero1: bool = False):
    """Place a TrainState on the mesh per ``state_shardings``."""
    return jax.tree.map(jax.device_put, state,
                        state_shardings(state, mesh, zero1=zero1))
