"""Per-op device-time profile of the flagship forward / train step.

Captures a jax.profiler trace of K steady-state iterations on the real
chip, parses the trace-viewer JSON (works over the axon relay), and prints
a per-op-group device-time table — the measurement behind BASELINE.md's
per-stage floor analysis and the train-step glue accounting (the reference
has wall-clock meters only, SURVEY §5.1 /
/root/reference/utils/video_action_recognition.py:78-98).

Usage:
    python benchmarks/profile_step.py fwd   [bs]   # default bs=2
    python benchmarks/profile_step.py train [bs]   # default bs=8
    python benchmarks/profile_step.py train 8 --dump ops.json  # full op list
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_trace_events(logdir: str):
    """Read every trace-viewer json(.gz) under a profiler logdir."""
    pats = [os.path.join(logdir, "**", "*.trace.json.gz"),
            os.path.join(logdir, "**", "*.trace.json")]
    files = sorted({f for p in pats for f in glob.glob(p, recursive=True)})
    if not files:
        raise FileNotFoundError(f"no trace json under {logdir}")
    events = []
    for f in files:
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            events.extend(json.load(fh).get("traceEvents", []))
    return events


def device_op_times(logdir: str):
    """Sum device-thread complete-event durations per op name.

    The TPU device rows live under a process whose name mentions the
    device; host python/runtime rows are skipped. Returns
    {op_name: total_us} summed over all steps in the trace window.
    """
    events = _load_trace_events(logdir)
    # individual HLO ops live on threads named "XLA Ops"; sibling threads
    # carry whole-module spans ("XLA Modules"), step markers ("Steps"), and
    # host rows — summing those double-counts every op
    op_keys = {(e["pid"], e["tid"])
               for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name", "").startswith("XLA Ops")}
    times: dict[str, float] = {}
    bytes_: dict[str, float] = {}
    meta: dict[str, dict] = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_keys:
            continue
        name = e.get("name", "")
        times[name] = times.get(name, 0.0) + float(e.get("dur", 0.0))
        args = e.get("args") or {}
        bytes_[name] = (bytes_.get(name, 0.0)
                        + float(args.get("bytes_accessed", 0) or 0))
        if name not in meta and args:
            meta[name] = args
    device_op_times.meta = meta  # exemplar args per op, for the --dump file
    device_op_times.bytes = bytes_  # profiler per-op HBM byte estimates
    if not times:
        raise RuntimeError("no 'XLA Ops' thread found in trace "
                           f"(threads present: "
                           f"{sorted({e['args'].get('name') for e in events if e.get('ph') == 'M' and e.get('name') == 'thread_name'})[:20]})")
    return times


GROUPS = [
    # (label, regex over op name) — first match wins, ordered specific->broad
    ("pallas stem", r"stem_|pallas"),
    ("matcher/nan-guard while", r"while"),
    ("convolution (XLA emitter)", r"convolution"),
    ("conv fusions (bwd/fused)", r"fusion.*conv|conv.*fusion"),
    ("copies/transposes", r"^copy|transpose|bitcast|reshape"),
    ("all-reduce/collectives", r"all-reduce|all-gather|collective|psum"),
    ("dots", r"^dot|gemm"),
    ("dynamic slice/update", r"dynamic-"),
    ("reduce", r"^reduce"),
    ("fusions (elementwise/other)", r"^fusion|^loop_"),
]


STAGES = [
    # (label, regex over "tf_op||source") — first match wins
    ("stem (pallas kernels)", r"ops/pallas/stem\.py|backbone/pallas_call"),
    ("layer1", r"backbone/layer1_"),
    ("layer2", r"backbone/layer2_"),
    ("layer3", r"backbone/layer3_"),
    ("layer4", r"backbone/layer4_"),
    ("backbone glue (pad/pool/posenc)", r"backbone|_temporal_pool"),
    ("matcher (JV while)", r"ops/matcher\.py|_solve_rect"),
    ("optimizer (adam/clip/wd)", r"optax|engine\.py"),
    ("transformer + heads", r"encoder|decoder|TubeR|transformer|embed|"
                            r"class_|bbox_|input_proj|posenc"),
]


def stage_table(times: dict, iters: int):
    """Per-model-stage device time + profiler-attributed HBM bytes."""
    meta = getattr(device_op_times, "meta", {})
    byts = {n: b / iters for n, b in
            getattr(device_op_times, "bytes", {}).items()}
    rows = {label: [0.0, 0.0, 0] for label, _ in STAGES}
    rows["other"] = [0.0, 0.0, 0]
    for n, t in times.items():
        m = meta.get(n, {})
        key = (m.get("tf_op", "") or "") + "||" + (m.get("source", "") or "")
        for label, pat in STAGES:
            if re.search(pat, key):
                break
        else:
            label = "other"
        rows[label][0] += t
        rows[label][1] += byts.get(n, 0.0)
        rows[label][2] += 1
    t_tot = sum(r[0] for r in rows.values())
    b_tot = sum(r[1] for r in rows.values())
    print(f"{'stage':<34}{'ms':>8}{'GB':>8}{'GB/s':>8}{'#ops':>6}")
    for label, (us, b, n) in sorted(rows.items(), key=lambda kv: -kv[1][0]):
        if n == 0:
            continue
        gbps = b / (us / 1e6) / 1e9 if us else 0.0
        print(f"{label:<34}{us / 1e3:>8.2f}{b / 1e9:>8.2f}{gbps:>8.0f}{n:>6}")
    print(f"{'TOTAL':<34}{t_tot / 1e3:>8.2f}{b_tot / 1e9:>8.2f}"
          f"{b_tot / (t_tot / 1e6) / 1e9 if t_tot else 0:>8.0f}")
    return t_tot, b_tot


def group_table(times: dict, top_ops: int = 18):
    total = sum(times.values())
    rows, assigned = [], set()
    for label, pat in GROUPS:
        r = re.compile(pat)
        hit = {n: t for n, t in times.items()
               if n not in assigned and r.search(n)}
        assigned |= set(hit)
        if hit:
            rows.append((label, sum(hit.values()), len(hit)))
    other = {n: t for n, t in times.items() if n not in assigned}
    if other:
        rows.append(("other", sum(other.values()), len(other)))
    rows.sort(key=lambda r: -r[1])
    print(f"{'group':<34}{'ms':>9}{'%':>7}{'#ops':>6}")
    for label, us, n in rows:
        print(f"{label:<34}{us / 1e3:>9.2f}{100 * us / total:>6.1f}%{n:>6}")
    print(f"{'TOTAL device time':<34}{total / 1e3:>9.2f}")
    print("\ntop ops:")
    for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:top_ops]:
        print(f"  {t / 1e3:>8.2f} ms  {n[:110]}")
    return total


def profile_fwd(bs: int, logdir: str, iters: int = 6):
    import jax
    import jax.numpy as jnp

    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.utils import enable_compile_cache
    from __graft_entry__ import _flagship_cfg

    enable_compile_cache()
    cfg = _flagship_cfg()
    model = build_model(cfg)
    t_len, img = cfg.data.temp_len, cfg.data.img_size
    clips0 = np.zeros((1, t_len, img, img, 3), np.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, clips0, train=False)
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, c: model.apply(v, c, train=False))
    clips = jax.device_put(np.random.default_rng(0).normal(
        0, 1, (bs, t_len, img, img, 3)).astype(np.float32))
    out = fwd(variables, clips)  # compile + warm
    _ = float(jax.device_get(out["pred_logits"]).sum())
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = fwd(variables, clips)
    _ = float(jax.device_get(out["pred_logits"]).sum())
    jax.profiler.stop_trace()
    return iters


def profile_train(bs: int, logdir: str, iters: int = 4):
    import jax
    import jax.numpy as jnp

    from tubelet_transformer_tpu.config import Config
    from tubelet_transformer_tpu.data.loader import collate
    from tubelet_transformer_tpu.data.synthetic import SyntheticAVADataset
    from tubelet_transformer_tpu.models.tuber import build_model
    from tubelet_transformer_tpu.train import engine
    from tubelet_transformer_tpu.utils import enable_compile_cache
    from __graft_entry__ import _flagship_cfg

    enable_compile_cache()
    cfg = _flagship_cfg()
    cfg.data.dataset_name = "synthetic"
    cfg.train.batch_size = bs
    # reference fine-tune recipe: pretrained backbone, tune_point freeze,
    # bs=2-chunked frozen prefix (matches bench_train.py's recipe)
    cfg.model.pretrained = True
    cfg.train.frozen_chunk = 2

    model = build_model(cfg)
    ds = SyntheticAVADataset(cfg, size=bs)
    rng = np.random.default_rng(0)
    batch = collate([ds.get(i, rng) for i in range(bs)])
    db = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
          if k in ("clips", "pad_mask", "boxes", "labels", "valid", "sizes")}
    state, tx, _ = engine.create_train_state(
        cfg, model, jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    step = engine.make_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(1)
    lw = jnp.float32(cfg.loss.dice_cof)
    state, m = step(state, db, key, lw)  # compile + warm
    _ = float(jax.device_get(m["total_loss"]))
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        state, m = step(state, db, key, lw)
    _ = float(jax.device_get(m["total_loss"]))
    jax.profiler.stop_trace()
    return iters


def main(argv):
    mode = argv[0] if argv else "train"
    bs = int(argv[1]) if len(argv) > 1 else (8 if mode == "train" else 2)
    dump = None
    if "--dump" in argv:
        dump = argv[argv.index("--dump") + 1]
    logdir = tempfile.mkdtemp(prefix=f"prof_{mode}_")
    iters = (profile_train if mode == "train" else profile_fwd)(bs, logdir)
    times = device_op_times(logdir)
    # normalize to per-iteration
    times = {n: t / iters for n, t in times.items()}
    print(f"\n== {mode} bs={bs}: per-step device time "
          f"(avg over {iters} steps) ==")
    total = group_table(times)
    print(f"\nper-clip: {total / 1e3 / bs:.3f} ms")
    print(f"\n== per-stage floor table ({mode} bs={bs}) ==")
    # times were normalized per-iteration above; bytes still need /iters
    t_tot, b_tot = stage_table(times, iters)
    print(f"per-clip bytes (profiler-attributed): {b_tot / bs / 1e9:.2f} GB")
    if dump:
        meta = getattr(device_op_times, "meta", {})
        with open(dump, "w") as f:
            json.dump({n: {"ms": t / 1e3, **meta.get(n, {})} for n, t in
                       sorted(times.items(), key=lambda kv: -kv[1])}, f,
                      indent=1)
        print(f"full op list -> {dump}")


if __name__ == "__main__":
    main(sys.argv[1:])
