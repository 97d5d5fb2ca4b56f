"""GPipe-style pipeline parallelism over a homogeneous layer stack.

TPU-native pipeline parallelism for the transformer encoder: the stack of
identical layers is split into ``mesh.shape['pipe']`` stages, each stage's
parameters live only on its stage's devices (the stacked layer axis is
sharded ``P('pipe')``), and microbatches flow through the stages with
``jax.lax.ppermute`` activation hand-offs inside a ``shard_map`` — the
standard JAX collective-pipelining recipe (scaling-book "pipelining"
chapter). The schedule is plain GPipe: with M microbatches and P stages the
loop runs M + P - 1 ticks; stage p works on microbatch (t - p) at tick t;
bubble fraction (P-1)/(M+P-1).

No reference analog: the reference is data-parallel only
(/root/reference/pipelines/launch.py:20-50). The TubeR model (~70 M params)
does not *need* PP for capacity — this exists as framework capability
(brief: dp/tp/sp/pp/ep), and it is loss-exact: tests/test_pipeline.py checks
forward and gradients against the sequential layer loop.

Everything is reverse-mode differentiable: ``lax.scan`` over a static tick
count and ``ppermute`` (whose transpose is the inverse permutation).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pvary(x, names):
    """Mark ``x`` as varying over the given manual mesh axes (VMA typing for
    shard_map carries; jax>=0.9 spells this pcast)."""
    try:
        return jax.lax.pcast(x, names, to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, names)


def stack_layer_params(layer_trees: list):
    """[{params of layer 0}, ...] -> one tree with stacked (L, ...) leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_trees)


def unstack_layer_params(stacked, n_layers: int) -> list:
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(n_layers)]


def stack_encoder_params(tr_params: dict, n_layers: int) -> dict:
    """Transformer param tree with ``encoder_layer_{i}`` subtrees folded into
    the stacked ``encoder_stack`` layout the pipelined encoder declares.
    Lets checkpoints written by (or converted for) the sequential model load
    into a MESH.PIPE > 1 run."""
    out = {k: v for k, v in tr_params.items()
           if not k.startswith("encoder_layer_")}
    out["encoder_stack"] = stack_layer_params(
        [tr_params[f"encoder_layer_{i}"] for i in range(n_layers)])
    return out


def unstack_encoder_params(tr_params: dict, n_layers: int) -> dict:
    """Inverse of :func:`stack_encoder_params` (for export / non-PP resume)."""
    out = {k: v for k, v in tr_params.items() if k != "encoder_stack"}
    for i, tree in enumerate(
            unstack_layer_params(tr_params["encoder_stack"], n_layers)):
        out[f"encoder_layer_{i}"] = tree
    return out


def pipeline_apply(
    layer_fn: Callable[[Any, jnp.ndarray, Any, Optional[jnp.ndarray]], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    aux: Any,
    mesh: Mesh,
    microbatches: int,
    rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run a stack of identical layers as a GPipe pipeline over 'pipe'.

    Args:
      layer_fn: ``(layer_params, x_mb, aux_mb, rng_or_None) -> y_mb`` applying
        ONE layer to one microbatch. ``rng`` (when given) is pre-folded per
        (global layer, microbatch) so dropout draws are well-defined.
      stacked_params: pytree with leading layer axis L on every leaf;
        L must be divisible by the 'pipe' axis size.
      x: (B, ...) activations; batch is (globally) sharded over 'data'.
      aux: pytree of (B, ...) arrays consumed alongside x (masks, posenc);
        replicated over 'pipe' so any stage can read any microbatch's slice.
      mesh: the ('data', 'model', 'pipe') device mesh.
      microbatches: M; the per-data-shard batch must divide by M.
      rng: optional dropout key (replicated).

    Returns y with x's shape/order — exactly the sequential layer loop's
    output (up to psum summation of one-hot-selected terms).
    """
    n_stages = mesh.shape["pipe"]
    n_data = mesh.shape.get("data", 1)
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    m = microbatches
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")
    l_per = n_layers // n_stages
    b = x.shape[0]
    if b % (m * n_data):
        raise ValueError(f"batch {b} not divisible by microbatches {m} x "
                         f"data axis {n_data}")

    # Microbatch-major layout: (B, ...) -> (M, B/M, ...); axis 1 carries the
    # 'data' sharding. Restored inversely at the end, so order is preserved.
    def to_mb(a):
        return a.reshape((m, b // m) + a.shape[1:])

    xs = to_mb(x)
    aux_mb = jax.tree.map(to_mb, aux)
    ticks = m + n_stages - 1

    def body(xs, aux_mb, stacked, rng_in):
        stage = jax.lax.axis_index("pipe")
        if rng_in is not None:
            # decorrelate dropout across data shards: without this fold
            # every shard would draw the same mask for its local slice
            # (the replicated key + identical local shapes). 'model' stays
            # out of the fold — outputs must remain replicated over it.
            rng_in = jax.random.fold_in(rng_in, jax.lax.axis_index("data"))
        carry = _pvary(jnp.zeros(xs.shape[1:], xs.dtype), ("data", "pipe"))
        out = _pvary(jnp.zeros_like(xs), ("pipe",))

        def tick(state, t):
            carry, out = state
            mb = t - stage
            mbc = jnp.clip(mb, 0, m - 1)
            y = jnp.where(stage == 0, xs[mbc], carry)
            a_t = jax.tree.map(lambda a: a[mbc], aux_mb)
            for i in range(l_per):
                p_i = jax.tree.map(lambda a: a[i], stacked)
                r_i = None
                if rng_in is not None:
                    layer_id = stage * l_per + i
                    r_i = jax.random.fold_in(
                        jax.random.fold_in(rng_in, layer_id), mbc)
                y = layer_fn(p_i, y, a_t, r_i)
            valid = (mb >= 0) & (mb < m)
            y = jnp.where(valid, y, 0.0)
            write = jnp.where(valid & (stage == n_stages - 1), y, out[mbc])
            out = jax.lax.dynamic_update_index_in_dim(out, write, mbc, 0)
            carry = jax.lax.ppermute(
                y, "pipe", [(i, i + 1) for i in range(n_stages - 1)])
            return (carry, out), None

        (_, out), _ = jax.lax.scan(tick, (carry, out), jnp.arange(ticks))
        # Results live on the last stage only; the masked psum replicates
        # them across 'pipe' (and proves replication to shard_map's checker).
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, 0.0), "pipe")

    pad = lambda nd: P(None, "data", *([None] * (nd - 2)))  # noqa: E731
    in_specs = (
        jax.tree.map(lambda a: pad(a.ndim), xs),
        jax.tree.map(lambda a: pad(a.ndim), aux_mb),
        jax.tree.map(lambda a: P("pipe", *([None] * (a.ndim - 1))),
                     stacked_params),
        None if rng is None else P(),
    )
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=in_specs,
        out_specs=pad(xs.ndim),
    )(xs, aux_mb, stacked_params, rng)
    return out.reshape(x.shape)
