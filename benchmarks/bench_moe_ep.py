"""Expert-parallel MoE cost model from compiled HLO (virtual 8-device mesh).

Single-chip wall-clock for the MoE variants lives in bench_moe.py; this
benchmark answers the multi-device question ("what does EP actually buy and
cost?") without multi-chip hardware: it compiles the MoE encoder FFN under
GSPMD on an 8-device virtual CPU mesh in three placements and reports, per
device, the compiled module's FLOPs, the collective operations it contains,
and the bytes those collectives move. Wall-clock on virtual CPU devices is
meaningless; collective bytes x ICI bandwidth + per-device FLOPs x MXU rate
is the honest v5e cost model, and both inputs come straight from the
compiled artifact.

Placements (flagship encoder shapes: B=8 global, S=256 tokens, D=256,
F=2048, E=8 experts, top-1):
  * dense      — stock dense FFN, pure DP over 8 devices (baseline);
  * moe_dp     — MoE, experts REPLICATED, DP over 8: every device stores all
                 E kernels and computes its own tokens' dispatch locally
                 (zero collectives, E x kernel memory);
  * moe_ep     — MoE, experts sharded over 'model' (data=4 x model=2): each
                 device stores E/2 kernels; GSPMD inserts the dispatch
                 all-gather + combine reduce (reported below).

No reference analog (SURVEY §2.8 is DP-only). Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/bench_moe_ep.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                    # noqa: E402

# the container's sitecustomize pins JAX_PLATFORMS to the TPU plugin; the
# env var alone cannot select CPU (tests/conftest.py has the same override)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P    # noqa: E402

B, S, D, F, E, TOPK = 8, 256, 256, 2048, 8, 1

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}
_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def collective_stats(hlo_text: str) -> dict:
    """Count collective ops and the bytes of their result shapes.

    GSPMD emits collectives as HLO instructions whose result shape is
    printed inline, e.g. ``bf16[4,256,2048]{...} all-gather(...)`` (tuple
    results for variadic all-reduce). Byte counts are per-device: the
    printed shapes are the per-participant buffers.
    """
    stats = {}
    for kind in _COLLECTIVES:
        ops, total = 0, 0
        # shapes immediately preceding the op name on its defining line;
        # tuple-shaped results list every member
        for m in re.finditer(
                r"((?:\w+\[[\d,]*\][^ ]* ?)+)%?" + kind + r"[.\d]*\(",
                hlo_text):
            ops += 1
            for sm in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
                dt, dims = sm.group(1), sm.group(2)
                n = 1
                for d in filter(None, dims.split(",")):
                    n *= int(d)
                total += n * _DTYPE_BYTES.get(dt, 4)
        if ops:
            stats[kind] = {"ops": ops, "bytes": total}
    return stats


def build_ffn(num_experts: int):
    from flax import linen as nn

    from tubelet_transformer_tpu.models.moe import MoEFFN

    if num_experts:
        return MoEFFN(d_model=D, dim_feedforward=F, num_experts=num_experts,
                      top_k=TOPK, dtype=jnp.bfloat16)

    class DenseFFN(nn.Module):
        """The stock encoder FFN slice (models/layers.py EncoderLayer),
        isolated so the comparison counts only FFN-path collectives."""

        @nn.compact
        def __call__(self, x):
            h = nn.Dense(F, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                         name="linear1")(x.astype(jnp.bfloat16))
            return nn.Dense(D, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                            name="linear2")(jax.nn.relu(h))

    return DenseFFN()


def compile_case(name: str, num_experts: int, model_axis: int) -> dict:
    from tubelet_transformer_tpu.parallel import mesh as mesh_lib
    from tubelet_transformer_tpu.parallel.sharding_rules import (
        param_shardings,
    )

    ffn = build_ffn(num_experts)
    x = np.zeros((B, S, D), np.float32)
    params = jax.jit(lambda r: ffn.init(r, x))(jax.random.PRNGKey(0))

    mesh = mesh_lib.create_mesh(data=8 // model_axis, model=model_axis)
    p_sh = param_shardings(params["params"], mesh)
    x_sh = NamedSharding(mesh, P("data"))

    def fwd(p, x):
        y = ffn.apply({"params": p}, x)
        if isinstance(y, tuple):
            y = y[0]
        return jnp.sum(y.astype(jnp.float32))

    compiled = jax.jit(fwd, in_shardings=(p_sh, x_sh)).lower(
        params["params"], x).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    colls = collective_stats(compiled.as_text())

    # per-device FFN parameter memory (fp32 as stored)
    kernel_bytes = sum(
        int(np.prod(leaf.shape)) * 4
        for leaf in jax.tree_util.tree_leaves(params["params"]))
    expert_div = model_axis if num_experts else 1

    return {
        "metric": f"moe_ep_hlo_{name}",
        "mesh": f"data={8 // model_axis} model={model_axis}",
        "flops_per_device": int(cost.get("flops", 0)),
        "bytes_accessed_per_device": int(cost.get("bytes accessed", 0)),
        "collectives": colls,
        "collective_bytes_total": sum(c["bytes"] for c in colls.values()),
        "param_bytes_per_device": int(kernel_bytes / expert_div),
        "unit": "hlo",
    }


def main() -> None:
    rows = [
        compile_case("dense_dp8", num_experts=0, model_axis=1),
        compile_case("moe8_dp8", num_experts=E, model_axis=1),
        compile_case("moe8_ep2", num_experts=E, model_axis=2),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)

    # Cost model: v5e ICI ~ 4.5e10 B/s per direction x 4 links usable for a
    # small all-gather; MXU bf16 ~ 2e14 FLOP/s. Report the modeled overhead
    # of EP's collectives relative to the FFN compute it distributes.
    ep = rows[2]
    ici_bps, mxu = 4.5e10, 2.0e14
    t_coll = ep["collective_bytes_total"] / ici_bps
    t_flops = ep["flops_per_device"] / mxu
    print(json.dumps({
        "metric": "moe_ep2_modeled_overhead_v5e",
        "value": round(t_coll / max(t_flops, 1e-12), 3),
        "unit": "collective_time/compute_time",
        "modeled_collective_us": round(t_coll * 1e6, 1),
        "modeled_compute_us": round(t_flops * 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
