"""Profile the bench workload; print per-op device-time decomposition.

Runs the same fwd+bwd as bench.py under jax.profiler.trace, parses the
xplane.pb with xprof's proto, and aggregates device time by HLO op,
grouped into coarse buckets. Usage:

    python tools/profile_bench.py [--out /tmp/ts_profile] [--frames 10]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_workload(trace_dir: str, frames: int) -> float:
    import jax
    import jax.numpy as jnp
    from triangle_splatting_tpu.utils.jax_setup import setup
    setup()
    from triangle_splatting_tpu.ops.projection import RasterSettings
    from triangle_splatting_tpu.ops.rasterize import rasterize
    from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

    P, W = 100_000, 800
    cam = make_camera(W, W)
    s = make_random_scene(P, seed=0, size_range=(0.01, 0.05))
    v = jnp.asarray(s["vertex"])
    o = jnp.asarray(s["opacity"])
    c = jnp.asarray(s["rgb"])
    target = jnp.zeros((3, W, W))

    # Mirror bench.py exactly: non-rich photo kernels, stats stream off,
    # pair budget auto-sized from a probe frame.
    def make_step(settings):
        @jax.jit
        def fwd_bwd(vertex, opacity, rgb):
            def loss_fn(vertex, opacity, rgb):
                out = rasterize(vertex, opacity, None, cam, settings,
                                gamma=1.0, background=jnp.ones(3),
                                bg_depth=10.0, colors=rgb, need_stats=False)
                return jnp.abs(out["render"] - target).mean(), \
                    (out["overflow"], out["num_pairs"])
            (_, aux), g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                             has_aux=True)(vertex, opacity,
                                                           rgb)
            return g, aux
        return fwd_bwd

    from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
    probe = make_step(RasterSettings(image_width=W, image_height=W,
                                     rich_info=False, pairs_per_triangle=6))
    _, (overflow, num_pairs) = jax.block_until_ready(probe(v, o, c))
    assert not bool(overflow)
    ppt = adapt_pair_budget(6.0, int(num_pairs), P, False,
                            shrink_if_below=1.0)
    fwd_bwd = make_step(RasterSettings(image_width=W, image_height=W,
                                       rich_info=False,
                                       pairs_per_triangle=ppt))

    compiled = fwd_bwd.lower(v, o, c).compile()
    with open(os.path.join("/tmp", "profile_hlo.txt"), "w") as f:
        f.write(compiled.as_text())
    g = jax.block_until_ready(fwd_bwd(v, o, c))     # compile
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    for _ in range(frames):
        g = fwd_bwd(v, o, c)
    jax.block_until_ready(g)
    wall_ms = (time.time() - t0) / frames * 1000.0
    jax.profiler.stop_trace()
    return wall_ms


def parse_trace(trace_dir: str):
    """Aggregate device XLA-op durations (ns) from the Chrome trace dump.

    JAX's profiler writes <host>.trace.json.gz next to the xplane.pb; the
    device process (pid named '/device:TPU:*') has an 'XLA Ops' thread
    whose complete events carry per-op durations in us.
    """
    import gzip
    import json

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids, op_tids = set(), set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" and \
           "/device:" in e["args"].get("name", ""):
            dev_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name" and \
           e["args"].get("name") == "XLA Ops":
            op_tids.add((e["pid"], e.get("tid")))
    op_ns = defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and \
           (e["pid"], e.get("tid")) in op_tids:
            op_ns[e["name"]] += int(e.get("dur", 0) * 1000)
    return op_ns, path


def is_bwd_kernel(n):
    # The blend kernels' custom-calls carry the surrounding jvp scope name
    # in traces ("jvp__*" forward, "transpose_jvp__*" backward) on some jax
    # versions, the kernel function name on others.
    return "_bwd_kernel" in n or n.startswith("transpose_jvp")


def is_fwd_kernel(n):
    return "_fwd_kernel" in n or (n.startswith("jvp") and
                                  "transpose" not in n)


BUCKETS = [
    ("bwd_kernel", is_bwd_kernel),
    ("fwd_kernel", is_fwd_kernel),
    ("scatter", lambda n: "scatter" in n),
    ("gather", lambda n: "gather" in n),
    ("sort", lambda n: "sort" in n),
    ("reduce_window/scan", lambda n: "reduce-window" in n or "while" in n),
    ("copy/transpose", lambda n: "copy" in n or "transpose" in n),
    ("fusion", lambda n: "fusion" in n),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ts_profile")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    wall_ms = run_workload(args.out, args.frames)
    op_ns, path = parse_trace(args.out)

    total_ms = sum(op_ns.values()) / 1e6
    print(f"\nwall {wall_ms:.2f} ms/frame; device total {total_ms:.2f} ms "
          f"({total_ms / args.frames:.2f} ms/frame) from {path}\n")

    bucket_ns = defaultdict(int)
    for name, ns in op_ns.items():
        for bname, pred in BUCKETS:
            if pred(name):
                bucket_ns[bname] += ns
                break
        else:
            bucket_ns["other"] += ns
    print("=== buckets (ms/frame) ===")
    for bname, ns in sorted(bucket_ns.items(), key=lambda kv: -kv[1]):
        print(f"{ns / 1e6 / args.frames:8.3f}  {bname}")

    # Source mapping from the compiled text written by run_workload —
    # names only transfer within one process/compile.
    srcmap = {}
    try:
        import re as _re
        for line in open("/tmp/profile_hlo.txt"):
            m = _re.search(r"%([\w.]+) = ", line)
            if not m:
                continue
            op = _re.search(r'op_name="([^"]+)"', line)
            sl = _re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
            tag = ""
            if op:
                tag += op.group(1)[-58:]
            if sl:
                tag += " " + sl.group(1).split("/")[-1] + ":" + sl.group(2)
            srcmap[m.group(1)] = tag
    except OSError:
        pass

    print(f"\n=== top {args.top} ops (ms/frame) ===")
    for name, ns in sorted(op_ns.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ns / 1e6 / args.frames:8.3f}  {name[:40]:42s} {srcmap.get(name, '')[:90]}")


if __name__ == "__main__":
    main()
